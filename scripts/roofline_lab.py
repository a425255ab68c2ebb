"""CUB-scale f32 prepared-head roofline decomposition (round-4 item 3).

The committed BENCH_r03 head_hbm_roofline_frac read 0.837 vs the >=0.90
target; diagnosis says ~2 us of fixed per-call cost at S=5994. This lab
splits the 19-20 us call into DMA+tail (int4_impl='_probe_skip' — no dot)
vs full, across bank tile sizes, with the pure stream kernel paired in
the same interleaved loop for an honest per-cycle roofline ratio.

Run on the chip: python scripts/roofline_lab.py
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


def stream_case(rng, rows, D=512):
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s_big = jnp.asarray(rng.standard_normal((rows, D)).astype(np.float32))

    def _kernel(s_ref, out_ref, acc_ref, *, n_tiles):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += s_ref[0:8, :]

        @pl.when(j == n_tiles - 1)
        def _():
            out_ref[:] = acc_ref[:]

    def stream(s, carry):
        n = s.shape[0] // 2048
        return pl.pallas_call(
            functools.partial(_kernel, n_tiles=n),
            grid=(n,),
            in_specs=[pl.BlockSpec((2048, D), lambda j: (j, 0))],
            out_specs=pl.BlockSpec((8, D), lambda j: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, D), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, D), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)
            ),
        )(s).mean()

    return ("stream", stream, (s_big,)), s_big.size * 4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--s", type=int, default=5994)
    ap.add_argument("--c", type=int, default=200)
    ap.add_argument("--d", type=int, default=512)
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--blocks", default="1024,2048,3072")
    ap.add_argument("--cycles", type=int, default=9)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    S, C, D, B = args.s, args.c, args.d, args.b
    sfeat = jnp.asarray(rng.standard_normal((S, D)), jnp.float32)
    sy = jnp.asarray(rng.integers(0, C, S).astype(np.int32))
    q = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)

    scase, sbytes = stream_case(rng, 12288, D)
    cases = [scase]
    preps = {}
    for bs in (int(x) for x in args.blocks.split(",")):
        prep = prepare_support(sfeat, sy, C, block_s=bs)
        preps[bs] = prep
        bank_bytes = prep.s.size * prep.s.dtype.itemsize

        def mk(impl):
            def fn(q_, p_, carry):
                kw = {} if impl is None else {"int4_impl": impl}
                return nw_fused_from_prepared(q_, p_, C, **kw).sum() * 1e-6
            return fn

        cases.append((f"full_bs{bs}", mk(None), (q, prep)))
        cases.append((f"skip_bs{bs}", mk("_probe_skip"), (q, prep)))
    res, samples = interleaved_time(
        cases, cycles=args.cycles, return_samples=True,
    )
    t_stream = res["stream"]
    bw = sbytes / t_stream
    print(f"stream: {t_stream * 1e6:.1f} us -> {bw / 1e9:.0f} GB/s")
    for bs, prep in preps.items():
        bank_bytes = prep.s.size * prep.s.dtype.itemsize
        floor = bank_bytes / bw
        for tag in ("full", "skip"):
            t = res[f"{tag}_bs{bs}"]
            # paired per-cycle ratio vs stream
            r = sorted(
                (bank_bytes / sbytes) * a / b
                for a, b in zip(samples["stream"], samples[f"{tag}_bs{bs}"])
            )[args.cycles // 2]
            print(
                f"bs={bs} {tag}: {t * 1e6:.2f} us "
                f"(DMA floor {floor * 1e6:.2f}, frac {r:.3f})"
            )


if __name__ == "__main__":
    main()
