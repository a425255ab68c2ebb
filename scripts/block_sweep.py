"""Tail-tuning sweep for the double-buffered serving kernel: block size
(pipeline tail = one tile's compute) and B=8/64, interleaved vs stream."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from scripts.kernel_lab import interleaved_time, _loop_maker, stream_reduce
from nwhead_tpu.ops.pallas_nw import nw_fused_log_probs, prepare_support


def main():
    B, S, D, C = 64, 5994, 512, 200
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    bank = jnp.asarray(rng.standard_normal((S, D)).astype(np.float32))
    sy = jnp.asarray(rng.integers(0, C, size=S).astype(np.int32))
    s_big = jnp.asarray(rng.standard_normal((12288, D)).astype(np.float32))

    cases = [
        ("stream", lambda n: _loop_maker(
            lambda s, carry: stream_reduce(s, 2048, True).mean(), n), (s_big,)),
    ]
    for bs in (512, 768, 1024, 1536):
        prep = prepare_support(bank, sy, C, block_s=bs)
        cases.append((
            f"f32 bs={bs}",
            lambda n, _p=prep: _loop_maker(
                lambda qq, p, carry: nw_fused_log_probs(qq, p, None, C).mean(), n),
            (q, prep),
        ))
    for bs in (512, 1024):
        prep = prepare_support(bank, sy, C, block_s=bs, precision="bf16")
        cases.append((
            f"bf16 bs={bs}",
            lambda n, _p=prep: _loop_maker(
                lambda qq, p, carry: nw_fused_log_probs(qq, p, None, C).mean(), n),
            (q, prep),
        ))

    res = interleaved_time(cases, cycles=9)
    t_stream = res.pop("stream")
    bw = s_big.size * 4 / t_stream / 1e9
    print(f"stream: {t_stream*1e6:7.1f} us  {bw:6.1f} GB/s", flush=True)
    for name, t in res.items():
        nbytes = S * D * (2 if "bf16" in name else 4)
        print(f"{name}: {t*1e6:7.1f} us  frac_vs_stream={nbytes/(bw*1e9)/t:5.3f}",
              flush=True)


if __name__ == "__main__":
    main()
