"""On-chip A/B of the int4 prepared-kernel nibble-unpack chain (int4_impl).

First on-chip int4 run (chip_queue 2026-08-19) showed the unpack is the
int4 path's VPU wall: B=64 at S=1e6 cost 2.08 ms vs int8's 1.01 ms — the
unpack burned ~1.4 ms against the 0.35 ms of DMA it saved, and the 16M-row
giant bank ran at 0.17 of the stream roofline. Per byte the original chain
('select') costs convert-to-i32 + and + cmp + select + sub + shr + two
converts-to-i8; 'shift32' replaces the lo fixup with (x<<28)>>28 (two
shifts); 'shift8' does everything in the int8 domain ((b<<4)>>4 and b>>4,
wraps exact) with ZERO int32 converts — if Mosaic supports int8 vector
shifts, that removes the relayout-heavy converts entirely.

All three are value-identical (bit-equal parity is a CPU test,
tests/test_pallas_nw.py test_int4_unpack_impls_identical, plus the
compiled probe here). This lab times them interleaved at CUB and 1M
scales, with int8 as the reference wall.

ANSWERED (first on-chip run, 2026-08-20): Mosaic does NOT support int8
vector shifts — 'shift8' failed to legalize ('arith.shli' on
vector<...xi8>), so the pure-int8-domain chain is off the table. Round 4
replaced the whole per-byte approach with 'mxu': biased-lo packing makes
the signed byte an exact affine function of the two codes, so both
nibbles' dot products come from int8 MXU matmuls against the PACKED
bytes (the only per-byte VPU work is one i32 AND per four bytes).
Default impls here are vpu,mxu ('select'/'shift32' remain accepted
aliases of 'vpu').
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

# 'vpu2' (round 5): convert-free unpack — packed-i8 AND for the biased lo
# (bias corrected on the hoisted per-query sum) + i32 SWAR nibble
# sign-extension for the hi; targets the large-batch regime where 'mxu'
# pays 1.5x the int8 MXU MACs and legacy 'vpu' pays per-byte converts.
IMPLS = ("vpu", "vpu2", "mxu")


def device_bank(S, C, D, seed=7):
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(seed), 3)
    sy = jax.random.randint(k0, (S,), 0, C, dtype=jnp.int32)
    cents = 0.1 * jax.random.normal(k1, (C, D), jnp.float32)

    @jax.jit
    def build(sy):
        return cents[sy] + 0.05 * jax.random.normal(k2, (S, D), jnp.float32)

    return build(sy), sy


def parity_probe(q, prep, C, kernel):
    impls = [i for i in IMPLS if not i.startswith("_")]  # _probe_* = timing-only
    outs = [
        np.asarray(nw_fused_from_prepared(q, prep, C, kernel=kernel,
                                          int4_impl=i))
        for i in impls
    ]
    for name, o in zip(impls[1:], outs[1:]):
        same = np.array_equal(outs[0], o)
        pd = np.abs(np.exp(outs[0]) - np.exp(o)).max()
        print(f"  compiled parity {impls[0]} vs {name}: bit-equal={same} "
              f"prob diff {pd:.2e}", flush=True)
        assert pd < 1e-5, pd


def main():
    global IMPLS
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", choices=["cub", "big", "both"], default="both")
    ap.add_argument("--kernel", default="euclidean")
    ap.add_argument("--batches", default="64,256")
    ap.add_argument("--cycles", type=int, default=5)
    ap.add_argument("--impls", default=",".join(IMPLS))
    ap.add_argument("--block_s", type=int, default=1024)
    args = ap.parse_args()
    IMPLS = tuple(args.impls.split(","))

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
        prep4 = prepare_support(sfeat, sy, C, kernel=args.kernel,
                                precision="int4", block_s=args.block_s)
        prep8 = prepare_support(sfeat, sy, C, kernel=args.kernel,
                                precision="int8", block_s=args.block_s)
        jax.block_until_ready(jax.tree.leaves(prep4))
        for B in (int(b) for b in args.batches.split(",")):
            q = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
            if B == 64:
                parity_probe(q, prep4, C, args.kernel)

            def mk(impl):
                def fn(q_, p_, carry):
                    out = nw_fused_from_prepared(
                        q_, p_, C, kernel=args.kernel, int4_impl=impl)
                    return out.sum() * 1e-6
                return fn

            def int8_fn(q_, p_, carry):
                return nw_fused_from_prepared(
                    q_, p_, C, kernel=args.kernel).sum() * 1e-6

            def int8_skip_fn(q_, p_, carry):
                return nw_fused_from_prepared(
                    q_, p_, C, kernel=args.kernel,
                    int4_impl="_probe_skip").sum() * 1e-6

            cases = [(i, mk(i), (q, prep4)) for i in IMPLS]
            cases.append(("int8", int8_fn, (q, prep8)))
            if any(i.startswith("_") for i in IMPLS):
                cases.append(("int8_skip", int8_skip_fn, (q, prep8)))
            res = interleaved_time(cases, cycles=args.cycles)
            base = res[IMPLS[0]]
            print(
                f"{tag} int4 B={B}: " + "  ".join(
                    f"{i} {res[i] * 1e3:.3f} ms ({base / res[i]:.2f}x)"
                    for i in IMPLS
                ) + f"  |  int8 wall {res['int8'] * 1e3:.3f} ms" + (
                    f"  int8_skip {res['int8_skip'] * 1e3:.3f} ms"
                    if "int8_skip" in res else ""
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
