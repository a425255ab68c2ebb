"""Isolate meta_stream cost for int4/int8 prepared banks (round 4).

At 8M rows (meta_stream forced) int4 lost to int8 despite winning at 1M
(resident metadata). This lab holds S=2M fixed and toggles meta_stream,
with _probe_skip (no dot) isolating DMA+tail from the unpack chain.

Run on the chip: python scripts/metastream_lab.py
"""

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from timing import interleaved_time  # noqa: E402
from nwhead_tpu.ops.pallas_nw import (  # noqa: E402
    nw_fused_from_prepared, prepare_support,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--s", type=int, default=2_000_000)
    ap.add_argument("--c", type=int, default=1000)
    ap.add_argument("--d", type=int, default=512)
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--cycles", type=int, default=5)
    args = ap.parse_args()
    S, C, D, B = args.s, args.c, args.d, args.b

    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(7), 3)
    sy = jax.random.randint(k0, (S,), 0, C, dtype=jnp.int32)
    cents = 0.1 * jax.random.normal(k1, (C, D), jnp.float32)
    sfeat = jax.jit(
        lambda sy_: cents[sy_] + 0.05 * jax.random.normal(k2, (S, D),
                                                          jnp.float32)
    )(sy)
    jax.block_until_ready(sfeat)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)

    for prec in ("int4", "int8"):
        prep = prepare_support(sfeat, sy, C, precision=prec)
        jax.block_until_ready(jax.tree.leaves(prep))
        n_tiles = prep.lane.shape[0]

        def mk(impl, ms):
            def fn(q_, p_, carry):
                kw = {"meta_stream": ms}
                if impl is not None:
                    kw["int4_impl"] = impl
                return nw_fused_from_prepared(q_, p_, C, **kw).sum() * 1e-6
            return fn

        cases = [
            ("res", mk(None, False), (q, prep)),
            ("stream", mk(None, True), (q, prep)),
            ("skip_res", mk("_probe_skip", False), (q, prep)),
            ("skip_stream", mk("_probe_skip", True), (q, prep)),
        ]
        res = interleaved_time(cases, cycles=args.cycles)
        line = f"{prec} S={S} B={B} n_tiles={n_tiles}:"
        for k in ("res", "stream", "skip_res", "skip_stream"):
            line += (
                f"  {k} {res[k] * 1e3:.3f} ms"
                f" ({res[k] / n_tiles * 1e9:.0f} ns/tile)"
            )
        print(line, flush=True)
        del prep


if __name__ == "__main__":
    main()
