"""On-chip A/B for the whole-batch query tile in the prepared serving path.

Compares block_b=128 (round-3 default: B=256 runs 2 query tiles, the bank
streams twice) vs the VMEM-budgeted whole-batch tile (bank streams once)
at CUB scale (S~6k, C=200) and 1M-bank scale (S=1e6, C=1000), for
f32/bf16/int8 prepared banks, B in {64, 256}.

Honest timing per CLAUDE.md: optimization_barrier loop carry, differential
loop lengths, interleaved round-robin sampling (scripts/timing.py). The big
bank is generated ON DEVICE (a 2 GB host->device transfer over the axon
tunnel stalls for minutes — bigbank_lab lesson).
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
from nwhead_tpu.ops.pallas_nw import nw_fused_from_prepared, prepare_support  # noqa: E402


def device_bank(S, C, D, seed=7):
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(seed), 3)
    sy = jax.random.randint(k0, (S,), 0, C, dtype=jnp.int32)
    cents = 0.1 * jax.random.normal(k1, (C, D), jnp.float32)

    @jax.jit
    def build(sy):
        return cents[sy] + 0.05 * jax.random.normal(k2, (S, D), jnp.float32)

    return build(sy), sy


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", choices=["cub", "big", "both"], default="both")
    ap.add_argument("--precisions", default="f32,bf16,int8")
    ap.add_argument("--cycles", type=int, default=7)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    scales = []
    if args.scale in ("cub", "both"):
        scales.append(("cub", 5994, 200, 512))
    if args.scale in ("big", "both"):
        scales.append(("big", 1_000_000, 1000, 512))

    for tag, S, C, D in scales:
        sfeat, sy = device_bank(S, C, D)
        jax.block_until_ready(sfeat)
        print(f"[{tag}] bank built on device: S={S} C={C} D={D}", flush=True)
        for prec in args.precisions.split(","):
            prep = prepare_support(sfeat, sy, C, precision=prec)
            jax.block_until_ready(jax.tree.leaves(prep))
            print(f"[{tag}] {prec} prepared", flush=True)
            for B in (64, 256):
                q = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)

                # The bank rides the timing loop as an ARGUMENT: closing
                # over it inlines 2 GB of HLO constants at big scale and
                # the remote compile service breaks the pipe (the 413 /
                # bigbank lesson).
                def mk(bb):
                    def fn(q_, prep_, carry):
                        out = nw_fused_from_prepared(
                            q_, prep_, C, block_b=bb)
                        return out.sum() * 1e-6
                    return fn

                res = interleaved_time([
                    ("old128", mk(128), (q, prep)),
                    ("new", mk(None), (q, prep)),
                ], cycles=args.cycles)
                old, new = res["old128"] * 1e3, res["new"] * 1e3
                print(
                    f"{tag} {prec} B={B}: old128 {old:.3f} ms  "
                    f"new {new:.3f} ms  speedup {old / new:.3f}x",
                    flush=True,
                )


if __name__ == "__main__":
    main()
