"""On-chip A/B of the prepared kernel's one-hot orientation (oh_impl).

'sub' (default): per-tile one-hot built (block_s, C_or_W) from the
sublane-major label copy — an nchunk-loop of (128, 1) column compares +
strided row-slab writes; the sub array rides resident VMEM or a
64 KB/tile lane-padded stream.

'lane': the one-hot is built TRANSPOSED (C_or_W, block_s) by ONE compare
of a (C_or_W, 1) sublane iota against the (1, block_s) lane-major label
row, and the aggregation matmul contracts BOTH lane dims (rhs-transposed
MXU op — probed natively supported + bit-exact on v5e). The sub array
(and its stream) disappears; resident metadata shrinks ~6x, so the
meta_stream auto-threshold keeps the faster resident layout to ~6M rows.

This lab checks compiled prob-space parity (MXU contraction order
differs — last-ulp score shifts) and measures both at CUB and 1M scales.
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


def device_bank(S, C, D, seed=7):
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(seed), 3)
    sy = jax.random.randint(k0, (S,), 0, C, dtype=jnp.int32)
    cents = 0.1 * jax.random.normal(k1, (C, D), jnp.float32)

    @jax.jit
    def build(sy):
        return cents[sy] + 0.05 * jax.random.normal(k2, (S, D), jnp.float32)

    return build(sy), sy


def parity_probe(q, prep, C, kernel):
    a = np.asarray(nw_fused_from_prepared(q, prep, C, kernel=kernel,
                                          oh_impl="sub"))
    b = np.asarray(nw_fused_from_prepared(q, prep, C, kernel=kernel,
                                          oh_impl="lane"))
    pd = np.abs(np.exp(a) - np.exp(b)).max()
    top = (a.argmax(1) == b.argmax(1)).mean()
    print(f"  parity {kernel}: prob diff {pd:.2e}  top1 agree {top:.3f}",
          flush=True)
    assert pd < 1e-4, pd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", choices=["cub", "big", "both"], default="both")
    ap.add_argument("--precisions", default="f32,bf16,int8")
    ap.add_argument("--kernel", default="euclidean")
    ap.add_argument("--batches", default="64,256")
    ap.add_argument("--cycles", type=int, default=5)
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
            prep = prepare_support(sfeat, sy, C, kernel=args.kernel,
                                   precision=prec)
            jax.block_until_ready(jax.tree.leaves(prep))
            for B in (int(b) for b in args.batches.split(",")):
                q = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
                if B == 64:
                    parity_probe(q, prep, C, args.kernel)

                def mk(impl):
                    def fn(q_, prep_, carry):
                        out = nw_fused_from_prepared(
                            q_, prep_, C, kernel=args.kernel, oh_impl=impl)
                        return out.sum() * 1e-6
                    return fn

                res = interleaved_time(
                    [("sub", mk("sub"), (q, prep)),
                     ("lane", mk("lane"), (q, prep))],
                    cycles=args.cycles,
                )
                print(
                    f"{tag} {prec} B={B}: sub {res['sub'] * 1e3:.3f} ms  "
                    f"lane {res['lane'] * 1e3:.3f} ms  "
                    f"(lane = {res['sub'] / res['lane']:.3f}x sub)",
                    flush=True,
                )


if __name__ == "__main__":
    main()
