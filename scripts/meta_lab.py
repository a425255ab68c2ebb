"""On-chip A/B of the prepared kernel's meta_stream metadata path.

Resident (default at small S): row metadata (l2 self-norms / int8 row
scales / both compact label layouts) rides whole-array in VMEM — zero
per-tile DMA issues, but the sublane-major label copy lane-pads
nchunk -> 128, so a 1M-row bank parks ~76 MB of metadata in VMEM and an
8M-row bank cannot compile at all. Streamed (meta_stream=True): metadata
lives in HBM and one tile of each array rides the double buffer alongside
the bank rows (+<1% traffic, 3-4 extra tiny DMA issues per tile).

Values are IDENTICAL by construction (same arithmetic, same data); the
parity probe asserts that compiled. This lab measures what streaming
costs at the scales that still fit resident, to set the auto threshold
(``_META_STREAM_BYTES``).
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


def parity_probe(q, prep, C, kernel):
    res = np.asarray(
        nw_fused_from_prepared(q, prep, C, kernel=kernel, meta_stream=False))
    str_ = np.asarray(
        nw_fused_from_prepared(q, prep, C, kernel=kernel, meta_stream=True))
    assert np.array_equal(res, str_), np.abs(res - str_).max()
    print(f"  parity {kernel}: bit-identical compiled", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", choices=["cub", "big", "both"], default="both")
    ap.add_argument("--precisions", default="f32,bf16,int8")
    ap.add_argument("--kernel", default="euclidean")
    ap.add_argument("--batches", default="64,256")
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
            prep = prepare_support(sfeat, sy, C, kernel=args.kernel,
                                   precision=prec)
            jax.block_until_ready(jax.tree.leaves(prep))
            for B in (int(b) for b in args.batches.split(",")):
                q = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
                if tag == "cub" and B == 64:
                    parity_probe(q, prep, C, args.kernel)

                def mk(ms):
                    def fn(q_, prep_, carry):
                        out = nw_fused_from_prepared(
                            q_, prep_, C, kernel=args.kernel, meta_stream=ms)
                        return out.sum() * 1e-6
                    return fn

                res = interleaved_time(
                    [("resident", mk(False), (q, prep)),
                     ("streamed", mk(True), (q, prep))],
                    cycles=args.cycles,
                )
                print(
                    f"{tag} {prec} B={B}: resident "
                    f"{res['resident'] * 1e3:.3f} ms  streamed "
                    f"{res['streamed'] * 1e3:.3f} ms  "
                    f"({res['resident'] / res['streamed']:.3f}x)",
                    flush=True,
                )


if __name__ == "__main__":
    main()
