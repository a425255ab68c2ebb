"""On-chip A/B of the prepared kernel's softmax exp implementation.

Three variants (values identical by construction, verified compiled):
  exp           — baseline: where(score > -inf/2, exp(score - m), 0)
  exp_noguard   — drop the per-element compare+select (masked scores are
                  finite-huge-negative; exp underflows to exactly 0)
  exp2_noguard  — exp2((score - m) * log2e): pays off only if Mosaic's
                  exp costs more than exp2 + one mul

The reduced-precision banks are VPU-bound (BASELINE.md whole-batch-tile
note): the S*B exp chain is the binding term, so shaving per-element ops
moves the headline. Honest timing per CLAUDE.md (interleaved differential,
bank rides as a jit ARG).
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

IMPLS = ("exp", "exp_noguard", "exp2_noguard")


def device_bank(S, C, D, seed=7):
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(seed), 3)
    sy = jax.random.randint(k0, (S,), 0, C, dtype=jnp.int32)
    cents = 0.1 * jax.random.normal(k1, (C, D), jnp.float32)

    @jax.jit
    def build(sy):
        return cents[sy] + 0.05 * jax.random.normal(k2, (S, D), jnp.float32)

    return build(sy), sy


def parity_probe(q, prep, C):
    """Compiled-Mosaic value check: all impls must agree exactly."""
    base = np.asarray(nw_fused_from_prepared(q, prep, C))
    for impl in IMPLS[1:]:
        got = np.asarray(nw_fused_from_prepared(q, prep, C, softmax_impl=impl))
        err = np.abs(np.exp(got) - np.exp(base)).max()
        print(f"  parity {impl}: max prob diff {err:.2e}", flush=True)
        assert err <= 3e-7, (impl, err)


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
                if tag == "cub":
                    parity_probe(q, prep, C)

                def mk(impl):
                    def fn(q_, prep_, carry):
                        out = nw_fused_from_prepared(
                            q_, prep_, C, softmax_impl=impl)
                        return out.sum() * 1e-6
                    return fn

                res = interleaved_time(
                    [(impl, mk(impl), (q, prep)) for impl in IMPLS],
                    cycles=args.cycles,
                )
                base = res["exp"] * 1e3
                row = "  ".join(
                    f"{impl} {res[impl] * 1e3:.3f} ms"
                    f" ({base / (res[impl] * 1e3):.3f}x)"
                    for impl in IMPLS
                )
                print(f"{tag} {prec} B={B}: {row}", flush=True)


if __name__ == "__main__":
    main()
