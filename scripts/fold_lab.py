"""On-chip A/B of the prepared kernel's fold2 score-chain rewrite.

fold2=True (new default) vs fold2=False (the previous chain), one process,
interleaved differential timing (CLAUDE.md rules):
  - l2: the caller pre-doubles q (f32/bf16) or qscale (int8) — both exact
    power-of-2 scalings — so the kernel drops its per-element ``2.0 * dot``
    multiply; q2 is hoisted out of the tile loop (it was recomputed per
    bank tile) and recovered exactly as 0.25*sum(qf^2).
  - quant dot/cosine/clip: the similarity scale folds into the per-query
    dequant column (one (B,) mul replaces a (B, S) per-element mul).

l2 values are BIT-IDENTICAL by construction (power-of-2 scaling commutes
with rounding); the parity probe asserts that compiled.
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


def parity_probe(q, prep, C, kernel, exact):
    old = np.asarray(
        nw_fused_from_prepared(q, prep, C, kernel=kernel, _fold2=False))
    new = np.asarray(
        nw_fused_from_prepared(q, prep, C, kernel=kernel, _fold2=True))
    if exact:
        assert np.array_equal(old, new), np.abs(old - new).max()
        print(f"  parity {kernel}: bit-identical", flush=True)
    else:
        err = np.abs(np.exp(new) - np.exp(old)).max()
        print(f"  parity {kernel}: max prob diff {err:.2e}", flush=True)
        assert err <= 1e-5, err


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", choices=["cub", "big", "both"], default="both")
    ap.add_argument("--precisions", default="f32,bf16,int8")
    ap.add_argument("--kernel", default="euclidean")
    ap.add_argument("--batches", default="64,256,512")
    ap.add_argument("--cycles", type=int, default=7)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    scales = []
    if args.scale in ("cub", "both"):
        scales.append(("cub", 5994, 200, 512))
    if args.scale in ("big", "both"):
        scales.append(("big", 1_000_000, 1000, 512))
    exact = args.kernel in ("euclidean", "hypersphere_euclidean")

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
                if tag == "cub":
                    # l2 is bit-identical at every precision (the doubling
                    # rides q / the dequant scale — all power-of-2 exact);
                    # quant dot-modes change one f32 rounding order.
                    parity_probe(q, prep, C, args.kernel, exact)

                def mk(fold):
                    def fn(q_, prep_, carry):
                        out = nw_fused_from_prepared(
                            q_, prep_, C, kernel=args.kernel, _fold2=fold)
                        return out.sum() * 1e-6
                    return fn

                res = interleaved_time(
                    [("old", mk(False), (q, prep)),
                     ("new", mk(True), (q, prep))],
                    cycles=args.cycles,
                )
                print(
                    f"{tag} {prec} B={B}: old {res['old'] * 1e3:.3f} ms  "
                    f"new {res['new'] * 1e3:.3f} ms  "
                    f"({res['old'] / res['new']:.3f}x)",
                    flush=True,
                )


if __name__ == "__main__":
    main()
