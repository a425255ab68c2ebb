"""Lab: the LIBRARY prepared serving head vs the stream floor, by tile
size and precision — the harness behind the head-roofline settle
(BASELINE.md's >=0.90 bar vs the measured 0.853 in round 2).

Times ``nw_fused_log_probs(q, PreparedSupport, None, C)`` — the exact
call bench.py's headline uses — under the honest interleaved/differential
methodology, against an in-process stream calibration, for:
  * block_s 512 / 1024 / 2048 (the double-buffer tile size),
  * f32 / bf16 / int8 banks,
  * B=64 and B=256 (the second re-streams the bank per 128-row tile).
"""

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)
from timing import interleaved_time  # noqa: E402


def main():
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from nwhead_tpu.ops.nw import nw_log_probs
    from nwhead_tpu.ops.pallas_nw import nw_fused_log_probs, prepare_support

    B, S, D, C = 64, 5994, 512, 200
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    q256 = jnp.asarray(rng.standard_normal((256, D)).astype(np.float32))
    bank = jnp.asarray(rng.standard_normal((S, D)).astype(np.float32))
    sy = jnp.asarray(rng.integers(0, C, size=S).astype(np.int32))

    # Parity oracle: the RAW fused path (same kernel math). On TPU the
    # XLA-chain naive reference differs by the MXU DEFAULT-precision
    # ~3e-4 relerr (CLAUDE.md), so it is only printed for reference.
    ref = np.asarray(nw_fused_log_probs(q, bank, sy, C))
    ref_naive = np.asarray(nw_log_probs(q, bank, sy, C))
    print(
        "  raw-fused vs naive relerr (MXU DEFAULT-precision floor): "
        f"{float(np.max(np.abs(ref - ref_naive) / (np.abs(ref_naive) + 1e-6))):.2e}",
        flush=True,
    )

    # Stream calibration kernel (same as bench.py's).
    s_big = jnp.asarray(rng.standard_normal((12288, D)).astype(np.float32))

    def _stream_kernel(s_ref, out_ref, acc_ref, *, n_tiles):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += s_ref[0:8, :]

        @pl.when(j == n_tiles - 1)
        def _():
            out_ref[:] = acc_ref[:]

    def stream(s, carry):
        s = s + 0.0 * carry
        n = s.shape[0] // 2048
        return pl.pallas_call(
            functools.partial(_stream_kernel, n_tiles=n),
            grid=(n,),
            in_specs=[pl.BlockSpec((2048, D), lambda j: (j, 0))],
            out_specs=pl.BlockSpec((8, D), lambda j: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, D), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, D), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)
            ),
        )(s).mean()

    preps = {}
    for bs in (512, 1024, 2048):
        preps[f"f32 bs={bs}"] = prepare_support(bank, sy, C, block_s=bs)
    preps["bf16 bs=1024"] = prepare_support(bank, sy, C, precision="bf16")
    preps["int8 bs=1024"] = prepare_support(bank, sy, C, precision="int8")

    def head_fn(prep):
        def fn(qq, carry):
            qq = jax.lax.optimization_barrier(
                qq + carry.astype(qq.dtype) * 1e-30
            )
            return nw_fused_log_probs(qq, prep, None, C).mean() * 1e-20

        return fn

    # Parity check first (every variant, incl. the flat-layout mask fold).
    for name, p in preps.items():
        out = np.asarray(nw_fused_log_probs(q, p, None, C))
        err = float(np.max(np.abs(out - ref) / (np.abs(ref) + 1e-6)))
        # f32 tol: on-chip MXU DEFAULT precision gives ~3e-4 between any
        # two summation orders (tile sizes); exact parity is a CPU
        # (interpret-mode) property, asserted in tests/test_pallas_nw.py.
        tol = {"f": 1e-3, "b": 3e-2, "i": 3e-1}[name[0]]
        status = "OK " if err < tol else "FAIL"
        print(f"  {status} relerr {name}: {err:.2e}", flush=True)

    cases = [("stream 25.2MB", stream, (s_big,))]
    for name, p in preps.items():
        cases.append((f"head B=64 {name}", head_fn(p), (q,)))
    cases.append(("head B=256 f32 bs=1024", head_fn(preps["f32 bs=1024"]),
                  (q256,)))
    cases.append(("head B=256 int8 bs=1024", head_fn(preps["int8 bs=1024"]),
                  (q256,)))

    res = interleaved_time(cases, cycles=9, target_s=0.08)
    t_stream = res.pop("stream 25.2MB")
    bw = s_big.size * 4 / t_stream / 1e9
    print(f"stream: {t_stream * 1e6:7.1f} us  {bw:6.1f} GB/s", flush=True)
    bank_bytes = {"f32": S * D * 4, "bf16": S * D * 2, "int8": S * D}
    for name, t in res.items():
        prec = name.split()[2]
        byt = bank_bytes[prec]
        if "B=256" in name:
            byt *= 2  # two 128-row query tiles re-stream the bank
        frac = (byt / (bw * 1e9)) / t
        print(
            f"{name}: {t * 1e6:7.1f} us  frac_vs_stream={frac:5.3f} "
            f"frac_vs_819={byt / 819e9 / t:5.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
