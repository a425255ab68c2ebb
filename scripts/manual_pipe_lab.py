"""Manual double-buffered DMA pipeline for the fused NW forward.

Hypothesis: Mosaic's automatic grid pipelining leaves ~4-6 us/call of
per-grid-step overhead + unoverlapped VPU work on the table (kernel_lab r14
decomposition). A single-program kernel that hand-rolls the
HBM->VMEM double buffering (pallas guide pattern) should approach
DMA_total + one_tile_compute.

Compares against the library prepared path, interleaved, honest timing.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from scripts.kernel_lab import interleaved_time, _loop_maker, stream_reduce
from nwhead_tpu.ops.nw import nw_log_probs
from nwhead_tpu.ops.pallas_nw import (
    nw_fused_log_probs, prepare_support, _round_up, LOG_FLOOR,
)

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _manual_kernel(
    scale_ref,   # SMEM (1,1)
    q_ref,       # (TB, D) VMEM
    s_hbm,       # (S_pad, D) ANY/HBM
    s2_ref,      # (n_tiles, nchunk, 128) VMEM (tiny)
    lane_ref,    # (n_tiles, nchunk, 128) VMEM
    sub_ref,     # (n_tiles, 128, nchunk) VMEM
    out_ref,     # (TB, C_pad)
    sbuf,        # (2, TS, D) VMEM scratch — double buffer
    m_ref, l_ref, acc_ref,  # stats scratch
    oh_ref,      # (TS, C_pad) scratch
    sem,         # DMA sems (2,)
    *,
    mode: str, n_tiles: int, c_pad: int, nchunk: int, block_s: int,
):
    q = q_ref[:]

    def get_dma(slot, idx):
        return pltpu.make_async_copy(
            s_hbm.at[pl.ds(idx * block_s, block_s), :],
            sbuf.at[slot],
            sem.at[slot],
        )

    m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    get_dma(0, 0).start()

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (128, c_pad), 1).astype(
        jnp.float32
    )

    def body(j, _):
        slot = j % 2

        @pl.when(j + 1 < n_tiles)
        def _():
            get_dma((j + 1) % 2, j + 1).start()

        get_dma(slot, j).wait()
        s = sbuf[slot]

        dot = jax.lax.dot_general(
            q, s, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if mode == "l2":
            qf = q.astype(jnp.float32)
            q2 = jnp.sum(qf * qf, axis=1, keepdims=True)
            s2row = jnp.concatenate(
                [s2_ref[pl.ds(j, 1), t:t + 1, :].reshape(1, 128) for t in range(nchunk)],
                axis=1,
            )
            d2 = jnp.maximum(q2 - 2.0 * dot + s2row, 0.0)
            score = -jnp.sqrt(d2)
        else:
            score = dot * scale_ref[0, 0]

        valid_row = jnp.concatenate(
            [lane_ref[pl.ds(j, 1), t:t + 1, :].reshape(1, 128) for t in range(nchunk)],
            axis=1,
        ) >= 0.0
        score = jnp.where(valid_row, score, _NEG_INF)

        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(score, axis=1, keepdims=True))
        m_safe = jnp.where(m_new > _NEG_INF / 2, m_new, 0.0)
        alpha = jnp.where(m_prev > _NEG_INF / 2, jnp.exp(m_prev - m_safe), 0.0)
        p = jnp.where(score > _NEG_INF / 2, jnp.exp(score - m_safe), 0.0)
        l_ref[:] = jnp.broadcast_to(
            l_prev * alpha + jnp.sum(p, axis=1, keepdims=True), l_ref.shape
        )

        for t in range(nchunk):
            col = sub_ref[pl.ds(j, 1), :, t:t + 1].reshape(128, 1)
            oh_ref[t * 128:(t + 1) * 128, :] = (col == col_ids).astype(jnp.float32)

        pv = jax.lax.dot_general(
            p, oh_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        return 0

    jax.lax.fori_loop(0, n_tiles, body, 0)
    l_final = jnp.maximum(l_ref[:, :1], 1e-30)
    out_ref[:] = jnp.log(acc_ref[:] / l_final + LOG_FLOOR)


def manual_fused(q, prepared, n_classes, *, interpret=False):
    s_p, s2c, lane, sub = prepared
    B, D0 = q.shape
    s_pad, D = s_p.shape
    n_tiles = lane.shape[0]
    nchunk = lane.shape[1]
    block_s = nchunk * 128
    c_pad = _round_up(n_classes, 128)
    block_b = min(128, _round_up(B, 8))
    b_pad = _round_up(B, block_b)
    q_p = jnp.pad(q, ((0, b_pad - B), (0, D - D0)))
    if q_p.dtype != s_p.dtype:
        q_p = q_p.astype(s_p.dtype)
    scale = jnp.float32(1.0)

    out = pl.pallas_call(
        functools.partial(
            _manual_kernel, mode="l2", n_tiles=n_tiles, c_pad=c_pad,
            nchunk=nchunk, block_s=block_s,
        ),
        grid=(b_pad // block_b,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((block_b, D), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(s2c.shape, lambda i: (0, 0, 0)),
            pl.BlockSpec(lane.shape, lambda i: (0, 0, 0)),
            pl.BlockSpec(sub.shape, lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((block_b, c_pad), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b_pad, c_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, block_s, D), s_p.dtype),
            pltpu.VMEM((block_b, 128), jnp.float32),
            pltpu.VMEM((block_b, 128), jnp.float32),
            pltpu.VMEM((block_b, c_pad), jnp.float32),
            pltpu.VMEM((block_s, c_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(scale.reshape(1, 1), q_p, s_p, s2c, lane, sub)
    return out[:B, :n_classes]


def main():
    B, S, D, C = 64, 5994, 512, 200
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    bank = jnp.asarray(rng.standard_normal((S, D)).astype(np.float32))
    sy = jnp.asarray(rng.integers(0, C, size=S).astype(np.int32))
    ref = np.asarray(nw_log_probs(q, bank, sy, C))

    results = {}
    for bs in (1024, 2048):
        prep = prepare_support(bank, sy, C, block_s=bs)
        out = np.asarray(manual_fused(q, prep, C))
        err = float(np.max(np.abs(out - ref) / (np.abs(ref) + 1e-6)))
        print(f"manual bs={bs} relerr: {err:.2e}", flush=True)
        results[bs] = prep

    prep_lib = prepare_support(bank, sy, C)
    s_big = jnp.asarray(rng.standard_normal((12288, D)).astype(np.float32))
    cases = [
        ("stream", lambda n: _loop_maker(
            lambda s, carry: stream_reduce(s, 2048, True).mean(), n), (s_big,)),
        ("library prepared", lambda n: _loop_maker(
            lambda qq, p, carry: nw_fused_log_probs(qq, p, None, C).mean(), n),
         (q, prep_lib)),
    ]
    for bs, prep in results.items():
        cases.append((
            f"manual bs={bs}",
            lambda n, _p=prep: _loop_maker(
                lambda qq, p, carry: manual_fused(qq, p, C).mean(), n),
            (q, prep),
        ))
        cases.append((
            f"manual bs={bs} B=8",
            lambda n, _p=prep: _loop_maker(
                lambda qq, p, carry: manual_fused(qq, p, C).mean(), n),
            (q[:8], prep),
        ))

    res = interleaved_time(cases)
    t_stream = res.pop("stream")
    bw = s_big.size * 4 / t_stream / 1e9
    floor = S * D * 4 / (bw * 1e9)
    print(f"stream: {t_stream*1e6:7.1f} us  {bw:6.1f} GB/s", flush=True)
    for name, t in res.items():
        print(f"{name}: {t*1e6:7.1f} us  frac_vs_stream={floor/t:5.3f}", flush=True)


if __name__ == "__main__":
    main()
