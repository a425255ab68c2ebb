"""Time the LIBRARY fused kernel (new design) on the TPU: raw vs prepared,
f32 vs bf16, vs in-process STREAM bandwidth. Also checks numerics and the
backward pass compiles + runs."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from scripts.kernel_lab import interleaved_time, _loop_maker, stream_reduce
from nwhead_tpu.ops.nw import nw_log_probs
from nwhead_tpu.ops.pallas_nw import (
    nw_fused_log_probs, prepare_support,
)


def main():
    B, S, D, C = 64, 5994, 512, 200
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    bank = jnp.asarray(rng.standard_normal((S, D)).astype(np.float32))
    sy = jnp.asarray(rng.integers(0, C, size=S).astype(np.int32))
    ref = np.asarray(nw_log_probs(q, bank, sy, C))

    prep_f32 = prepare_support(bank, sy, C)
    prep_bf16 = prepare_support(bank, sy, C, precision="bf16")

    for name, out in [
        ("raw f32", nw_fused_log_probs(q, bank, sy, C)),
        ("prepared f32", nw_fused_log_probs(q, prep_f32, None, C)),
        ("raw bf16", nw_fused_log_probs(q, bank, sy, C, precision="bf16")),
        ("prepared bf16", nw_fused_log_probs(q, prep_bf16, None, C)),
    ]:
        err = float(np.max(np.abs(np.asarray(out) - ref) / (np.abs(ref) + 1e-6)))
        print(f"relerr {name}: {err:.2e}", flush=True)

    # backward compiles + runs
    def loss(qq, ss):
        return nw_fused_log_probs(qq, ss, sy, C).sum()

    g = jax.jit(jax.grad(loss, argnums=(0, 1)))
    dq, ds = g(q, bank)
    print("grad norms:", float(jnp.linalg.norm(dq)), float(jnp.linalg.norm(ds)), flush=True)

    s_big = jnp.asarray(rng.standard_normal((12288, D)).astype(np.float32))
    cases = [
        ("stream", lambda n: _loop_maker(
            lambda s, carry: stream_reduce(s, 2048, True).mean(), n), (s_big,)),
        ("raw f32", lambda n: _loop_maker(
            lambda qq, ss, carry: nw_fused_log_probs(qq, ss, sy, C).mean(), n),
         (q, bank)),
        ("prepared f32", lambda n: _loop_maker(
            lambda qq, pf, carry: nw_fused_log_probs(qq, pf, None, C).mean(), n),
         (q, prep_f32)),
        ("prepared bf16", lambda n: _loop_maker(
            lambda qq, pf, carry: nw_fused_log_probs(qq, pf, None, C).mean(), n),
         (q, prep_bf16)),
        ("prepared f32 B=8", lambda n: _loop_maker(
            lambda qq, pf, carry: nw_fused_log_probs(qq, pf, None, C).mean(), n),
         (q[:8], prep_f32)),
    ]
    res = interleaved_time(cases)
    t_stream = res.pop("stream")
    bw = s_big.size * 4 / t_stream / 1e9
    print(f"stream: {t_stream*1e6:7.1f} us  {bw:6.1f} GB/s", flush=True)
    for name, t in res.items():
        nbytes = S * D * (2 if "bf16" in name else 4)
        floor = nbytes / (bw * 1e9)
        print(f"{name}: {t*1e6:7.1f} us  frac_vs_stream={floor/t:5.3f}", flush=True)

    # grad timing (training step cost)
    def gloss(qq, ss, carry):
        dq, ds = jax.grad(lambda a, b: nw_fused_log_probs(a, b, sy, C).sum(),
                          argnums=(0, 1))(qq, ss)
        return jnp.sum(dq[0]) + jnp.sum(ds[0])

    gres = interleaved_time(
        [("fwd+bwd f32", lambda n: _loop_maker(gloss, n), (q, bank))],
        n1=50, n2=350, cycles=5,
    )
    print(f"fwd+bwd f32: {gres['fwd+bwd f32']*1e6:7.1f} us", flush=True)


if __name__ == "__main__":
    main()
