"""Fused multi-head attention Pallas kernel (serving/inference).

Motivation (measured, scripts/vit_lab.py): XLA's unfused attention for
ViT-S/14 at B=64 spends 754 us/block of which only ~60 us is matmul — the
f32-softmax cast chain materializes the (B, H, N, N) score tensor in HBM
three times. This kernel computes scores -> f32 softmax -> PV entirely in
VMEM per (batch, head): for encoder-scale N (a few hundred tokens) the
whole score matrix fits on-chip, so no online-softmax tiling is needed —
one exact softmax per program.

Layout lessons (first version measured SLOWER than XLA):
  * pad minimally — N to the sublane multiple (16), head_dim not at all;
    zero-padding hd to 128 lanes tripled the q/k/v HBM traffic;
  * batch several (batch, head) pairs per grid program (``bh_block``) —
    a (B*H,)-sized grid pays per-step overhead 12x per ViT forward.

Scope: self-attention, no attention mask beyond sequence-length padding.
``fused_attention_qkv`` is fully differentiable (custom VJP, flash-style
recompute-in-backward, chunked at long N); the (q, k, v)-input
``fused_attention`` remains inference-only. The ViT serving path
(``models/quantize.py`` ``QuantizedViT.apply``) uses it; it is also a
public op for any encoder-style transformer at any N whose linear
footprint fits VMEM (the (N, N) score matrix never has to).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(jnp.finfo(jnp.float32).min)
_VMEM_LIMIT = 100 * 1024 * 1024  # v5e has 128 MiB; leave headroom


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, out_ref, *, scale: float, n_valid: int,
                 n_pad: int, bh_block: int):
    col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    for s in range(bh_block):
        q = q_ref[s]  # (n_pad, hd)
        k = k_ref[s]
        v = v_ref[s]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (n_pad, n_pad) f32
        if n_valid < n_pad:
            scores = jnp.where(col < n_valid, scores, _NEG_INF)
        m = jnp.max(scores, axis=1, keepdims=True)
        p = jnp.exp(scores - m)  # valid rows: m finite; padded rows are
        # sliced off by the wrapper.
        l = jnp.sum(p, axis=1, keepdims=True)
        probs = (p / jnp.maximum(l, 1e-30)).astype(v.dtype)
        out_ref[s] = jax.lax.dot_general(
            probs, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


def _attn_qkv_kernel(qkv_ref, out_ref, *, scale: float, H: int, hd: int,
                     D: int, k_chunk: int = 0):
    """k_chunk == 0 (or >= N): single-pass — whole (N, N) scores in VMEM.
    Otherwise: flash-style online softmax over K/V row chunks (the
    long-sequence path; only the (N, k_chunk) chunk is live)."""
    x = qkv_ref[0]  # (N, 3*D) — q | k | v lanes, heads contiguous within
    N = x.shape[0]
    outs = []
    for h in range(H):
        q = x[:, h * hd:(h + 1) * hd]
        if k_chunk <= 0 or k_chunk >= N:
            k = x[:, D + h * hd:D + (h + 1) * hd]
            v = x[:, 2 * D + h * hd:2 * D + (h + 1) * hd]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # (N, N) f32
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            probs = (p / jnp.maximum(l, 1e-30)).astype(v.dtype)
            outs.append(
                jax.lax.dot_general(
                    probs, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(out_ref.dtype)
            )
            continue
        m = jnp.full((N, 1), _NEG_INF, jnp.float32)
        l = jnp.zeros((N, 1), jnp.float32)
        acc = jnp.zeros((N, hd), jnp.float32)
        for c0 in range(0, N, k_chunk):
            c1 = min(c0 + k_chunk, N)
            k_c = x[c0:c1, D + h * hd:D + (h + 1) * hd]
            v_c = x[c0:c1, 2 * D + h * hd:2 * D + (h + 1) * hd]
            s = jax.lax.dot_general(
                q, k_c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # (N, c1-c0)
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p.astype(v_c.dtype), v_c, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = m_new
        outs.append((acc / jnp.maximum(l, 1e-30)).astype(out_ref.dtype))
    out_ref[0] = jnp.concatenate(outs, axis=1)


def _attn_qkv_bwd_kernel(qkv_ref, dout_ref, dqkv_ref, *, scale: float,
                         H: int, hd: int, D: int):
    """Backward per batch row: recompute scores/probs in VMEM (flash-style —
    nothing but qkv is saved), then the standard softmax-attention VJP:
    dV = P^T dO; dP = dO V^T; dS = P*(dP - rowsum(dP*P));
    dQ = dS K * scale; dK = dS^T Q * scale. Transposes are expressed as
    dot_general contractions over dim 0 (no Mosaic relayouts)."""
    x = qkv_ref[0]   # (N, 3D)
    do = dout_ref[0]  # (N, D)
    grads = []  # dq_h list, then dk_h, dv_h — assembled in qkv lane order
    dqs, dks, dvs = [], [], []
    for h in range(H):
        q = x[:, h * hd:(h + 1) * hd]
        k = x[:, D + h * hd:D + (h + 1) * hd]
        v = x[:, 2 * D + h * hd:2 * D + (h + 1) * hd]
        do_h = do[:, h * hd:(h + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-30)
        p_c = p.astype(v.dtype)
        # dV = P^T @ dO  (contract rows)
        dv = jax.lax.dot_general(
            p_c, do_h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dP = dO @ V^T
        dp = jax.lax.dot_general(
            do_h, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta = jnp.sum(dp * p, axis=1, keepdims=True)
        ds = (p * (dp - delta)).astype(q.dtype)
        dq = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        # dK = dS^T @ Q (contract rows)
        dk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dqs.append(dq.astype(dqkv_ref.dtype))
        dks.append(dk.astype(dqkv_ref.dtype))
        dvs.append(dv.astype(dqkv_ref.dtype))
    grads = dqs + dks + dvs
    dqkv_ref[0] = jnp.concatenate(grads, axis=1)


_FLASH_CHUNK = 512


def _select_k_chunk(N: int, D: int, itemsize: int) -> int:
    """0 = single-pass (whole (N, N) scores fit VMEM, differentiable);
    else the K/V chunk size for the flash-tiled forward. Raises only if
    even the chunked footprint (linear in N) cannot fit."""
    n_pad = _round_up(N, 8)
    # Single pass: (N, N) f32 scores + softmax temporaries (x3) + qkv/out.
    single = 3 * n_pad * n_pad * 4 + n_pad * 4 * D * itemsize
    if single <= _VMEM_LIMIT:
        return 0
    chunk = _FLASH_CHUNK
    chunked = (
        3 * n_pad * chunk * 4          # (N, chunk) scores + temporaries
        + n_pad * 4 * D * itemsize     # qkv block + out
        + 3 * n_pad * 4                # m / l / acc-ish per-row state
    )
    if chunked > _VMEM_LIMIT:
        raise ValueError(
            f"fused_attention_qkv: even the flash-tiled path needs "
            f"~{chunked >> 20} MiB of VMEM at N={N}, D={D} — shard the "
            f"sequence instead"
        )
    return chunk


def _attn_qkv_chunked_bwd_kernel(qkv_ref, dout_ref, dqkv_ref, *, scale: float,
                                 H: int, hd: int, D: int, k_chunk: int):
    """Flash-style chunked backward: nothing but qkv is saved. Per head,
    sweep 1 recomputes the online-softmax stats (m, l) AND the output
    (for delta = rowsum(dO * O)); sweep 2 recomputes each (N, chunk)
    probability block and emits the per-chunk dK/dV stores plus the dQ
    accumulation. Only O(N * k_chunk) score memory is ever live, so the
    backward runs at every N the flash-tiled forward supports."""
    x = qkv_ref[0]    # (N, 3D)
    do = dout_ref[0]  # (N, D)
    N = x.shape[0]
    for h in range(H):
        q = x[:, h * hd:(h + 1) * hd]
        do_h = do[:, h * hd:(h + 1) * hd]
        # Sweep 1: online-softmax recompute -> m, l, out_h, delta.
        m = jnp.full((N, 1), _NEG_INF, jnp.float32)
        l = jnp.zeros((N, 1), jnp.float32)
        acc = jnp.zeros((N, hd), jnp.float32)
        for c0 in range(0, N, k_chunk):
            c1 = min(c0 + k_chunk, N)
            k_c = x[c0:c1, D + h * hd:D + (h + 1) * hd]
            v_c = x[c0:c1, 2 * D + h * hd:2 * D + (h + 1) * hd]
            s = jax.lax.dot_general(
                q, k_c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p.astype(v_c.dtype), v_c, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = m_new
        l = jnp.maximum(l, 1e-30)
        out_h = acc / l
        delta = jnp.sum(do_h.astype(jnp.float32) * out_h, axis=1,
                        keepdims=True)
        # Sweep 2: per-chunk grads. dV_c = P_c^T dO; dP_c = dO V_c^T;
        # dS_c = P_c*(dP_c - delta); dQ += dS_c K_c * scale;
        # dK_c = dS_c^T Q * scale.
        dq = jnp.zeros((N, hd), jnp.float32)
        for c0 in range(0, N, k_chunk):
            c1 = min(c0 + k_chunk, N)
            k_c = x[c0:c1, D + h * hd:D + (h + 1) * hd]
            v_c = x[c0:c1, 2 * D + h * hd:2 * D + (h + 1) * hd]
            s = jax.lax.dot_general(
                q, k_c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            p = jnp.exp(s - m) / l  # (N, c) f32, final probabilities
            p_c = p.astype(v_c.dtype)
            dv = jax.lax.dot_general(
                p_c, do_h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(
                do_h, v_c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = (p * (dp - delta)).astype(q.dtype)
            dq = dq + jax.lax.dot_general(
                ds, k_c, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            dk = jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            dqkv_ref[0, c0:c1, D + h * hd:D + (h + 1) * hd] = (
                dk.astype(dqkv_ref.dtype))
            dqkv_ref[0, c0:c1, 2 * D + h * hd:2 * D + (h + 1) * hd] = (
                dv.astype(dqkv_ref.dtype))
        dqkv_ref[0, :, h * hd:(h + 1) * hd] = dq.astype(dqkv_ref.dtype)


def _attn_qkv_fwd_call(x, H, hd, scale, k_chunk, interpret):
    B, N, threeD = x.shape
    D = threeD // 3
    return pl.pallas_call(
        functools.partial(
            _attn_qkv_kernel, scale=scale, H=H, hd=hd, D=D, k_chunk=k_chunk
        ),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, N, 3 * D), lambda b: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, N, D), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, D), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def _attn_qkv_core(x, H: int, hd: int, scale: float, k_chunk: int,
                   interpret: bool):
    """x: (B, N, 3D) flat qkv; returns (B, N, D). k_chunk == 0 selects the
    single-pass kernel (and its whole-score-matrix backward); k_chunk > 0
    selects the flash-tiled forward + chunked backward pair."""
    return _attn_qkv_fwd_call(x, H, hd, scale, k_chunk, interpret)


def _attn_qkv_core_fwd(x, H, hd, scale, k_chunk, interpret):
    return _attn_qkv_fwd_call(x, H, hd, scale, k_chunk, interpret), (x,)


def _attn_qkv_core_bwd(H, hd, scale, k_chunk, interpret, residuals, g):
    (x,) = residuals
    B, N, threeD = x.shape
    D = threeD // 3
    if k_chunk <= 0:
        kern = functools.partial(
            _attn_qkv_bwd_kernel, scale=scale, H=H, hd=hd, D=D)
    else:
        kern = functools.partial(
            _attn_qkv_chunked_bwd_kernel, scale=scale, H=H, hd=hd, D=D,
            k_chunk=k_chunk)
    dqkv = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, 3 * D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, N, D), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, N, 3 * D), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, 3 * D), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(x, g.astype(x.dtype))
    return (dqkv,)


_attn_qkv_core.defvjp(_attn_qkv_core_fwd, _attn_qkv_core_bwd)


def fused_attention_qkv(
    qkv: jnp.ndarray,
    num_heads: int,
    *,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Transpose-free fused attention straight off the qkv projection.

    qkv: (B, N, 3, H, hd) exactly as produced by reshaping the fused qkv
    Dense output — NO host-side head transpose, padding, or copies (those
    cost more than the attention itself at encoder scale; measured in
    scripts/vit_lab.py). Heads are sliced as static lane windows inside the
    kernel. Returns (B, N, H*hd).

    Differentiable in every configuration: a custom VJP recomputes probs
    per batch row in VMEM (flash-style — only qkv is saved) and runs the
    softmax-attention backward as one more Pallas kernel, so
    ``attn_impl='fused'`` works for finetuning too. When N is too long for
    the whole (N, N) score matrix to live in VMEM, both the forward and
    the backward switch to flash-tiled online-softmax sweeps over K/V
    chunks (the backward recomputes stats + output in a first sweep, then
    emits per-chunk dK/dV and accumulates dQ in a second).
    """
    B, N, three, H, hd = qkv.shape
    assert three == 3 and H == num_heads
    D = H * hd
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k_chunk = _select_k_chunk(N, D, qkv.dtype.itemsize)
    sc = float(scale) if scale is not None else 1.0 / float(hd) ** 0.5

    x = qkv.reshape(B, N, 3 * D)  # free reshape (contiguous)
    return _attn_qkv_core(x, H, hd, sc, k_chunk, interpret)


def _attn_int8_kernel(x_ref, *refs, scale: float, H: int,
                      hd: int, D: int, a_qkv: float, a_proj: float,
                      ln_eps: float = 0.0, has_ls: bool = False,
                      residual: bool = False, k_chunk: int = 0,
                      quant: bool = True):
    """Whole attention sublayer in one kernel: [optional LayerNorm ->]
    qkv matmul -> per-head f32 softmax attention (bf16 score/PV matmuls)
    -> proj matmul [-> optional LayerScale -> optional residual add].
    ``quant=True``: both projections run as quantize -> int8 MXU dot ->
    dequant+bias (requant chains in VMEM); ``quant=False``: bf16 weights,
    bf16 MXU dots with f32 accumulation (the float serving variant). The
    normalized input, the (N, 3D) qkv tensor, and the attention
    intermediates never touch HBM — with LN + LayerScale + residual
    folded, a ViT block's attention half is ONE kernel with zero XLA
    elementwise passes around it."""
    i = 0
    ln_s_ref = ln_b_ref = None
    if ln_eps > 0.0:
        ln_s_ref = refs[i]; i += 1   # (1, D) f32
        ln_b_ref = refs[i]; i += 1   # (1, D) f32
    sqkv_ref = sproj_ref = None
    wqkv_ref = refs[i]; i += 1
    if quant:
        sqkv_ref = refs[i]; i += 1
    bqkv_ref = refs[i]; i += 1
    wproj_ref = refs[i]; i += 1
    if quant:
        sproj_ref = refs[i]; i += 1
    bproj_ref = refs[i]; i += 1
    ls_ref = None
    if has_ls:
        ls_ref = refs[i]; i += 1     # (1, D) bf16 LayerScale gamma
    out_ref = refs[i]; i += 1

    xf = x_ref[0].astype(jnp.float32)
    if ln_eps > 0.0:
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        xf = (xf - mean) * jax.lax.rsqrt(var + ln_eps) * ln_s_ref[0] \
            + ln_b_ref[0]
        # Match the unfused (Q)LayerNorm -> matmul chain bit-for-bit: the
        # residual stream carries bf16, so round through bf16 first.
        xf = xf.astype(jnp.bfloat16).astype(jnp.float32)
    if quant:
        x8 = jnp.clip(
            jnp.round(xf * (1.0 / a_qkv)), -127, 127
        ).astype(jnp.int8)
        h = jax.lax.dot_general(
            x8, wqkv_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (a_qkv * sqkv_ref[0]) + bqkv_ref[0]
    else:
        h = jax.lax.dot_general(
            xf.astype(jnp.bfloat16), wqkv_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bqkv_ref[0]
    h = h.astype(jnp.bfloat16)  # (N, 3D)
    N = h.shape[0]
    outs = []
    for hh in range(H):
        q = h[:, hh * hd:(hh + 1) * hd]
        if k_chunk <= 0 or k_chunk >= N:
            k = h[:, D + hh * hd:D + (hh + 1) * hd]
            v = h[:, 2 * D + hh * hd:2 * D + (hh + 1) * hd]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            probs = (p / jnp.maximum(l, 1e-30)).astype(v.dtype)
            outs.append(
                jax.lax.dot_general(
                    probs, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
            continue
        # Flash-tiled long-N path: the qkv tensor is fully VMEM-resident
        # (it's linear in N) — only the (N, N) score matrix is not, so
        # sweep K/V row chunks with an online softmax.
        m = jnp.full((N, 1), _NEG_INF, jnp.float32)
        l = jnp.zeros((N, 1), jnp.float32)
        acc = jnp.zeros((N, hd), jnp.float32)
        for c0 in range(0, N, k_chunk):
            c1 = min(c0 + k_chunk, N)
            k_c = h[c0:c1, D + hh * hd:D + (hh + 1) * hd]
            v_c = h[c0:c1, 2 * D + hh * hd:2 * D + (hh + 1) * hd]
            s = jax.lax.dot_general(
                q, k_c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p.astype(v_c.dtype), v_c, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = m_new
        outs.append(acc / jnp.maximum(l, 1e-30))
    att = jnp.concatenate(outs, axis=1)  # (N, D) f32
    if quant:
        # The unfused composition (fused_attention_qkv -> QDense proj)
        # hands the proj quantizer a BF16 attention output; round-trip
        # through bf16 before requant so both paths pick identical int8
        # codes — keeps the fused kernel and the long-N QDense fallback
        # in exact composition parity for the same weights.
        att = att.astype(jnp.bfloat16).astype(jnp.float32)
        a8 = jnp.clip(
            jnp.round(att * (1.0 / a_proj)), -127, 127
        ).astype(jnp.int8)
        out = jax.lax.dot_general(
            a8, wproj_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (a_proj * sproj_ref[0]) + bproj_ref[0]
    else:
        out = jax.lax.dot_general(
            att.astype(jnp.bfloat16), wproj_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bproj_ref[0]
    # Tail folds, matching the XLA chain's bf16 residual-stream math:
    # out_bf16 [* ls] [+ x].
    out = out.astype(out_ref.dtype)
    if has_ls:
        out = out * ls_ref[0]
    if residual:
        out = x_ref[0] + out
    out_ref[0] = out


def _int8_attn_linear_bytes(N: int, D: int, w_itemsize: int = 1) -> int:
    n_pad = _round_up(N, 8)
    return (
        (3 * D * D + D * D) * w_itemsize  # qkv + proj weights
        + n_pad * 3 * D * 2               # bf16 qkv tensor
        + 4 * n_pad * D * 4               # x8/att/requant/out temporaries
    )


def int8_attention_fits(N: int, D: int) -> bool:
    """Whether the single-pass int8 attention sublayer fits VMEM at
    sequence length N, embed dim D (per batch row: weights + (N, 3D) qkv
    + one (N, N) f32 score matrix + requant temporaries)."""
    n_pad = _round_up(N, 8)
    need = _int8_attn_linear_bytes(N, D) + 3 * n_pad * n_pad * 4
    return need <= _VMEM_LIMIT


def _int8_attn_k_chunk(N: int, D: int) -> int:
    """0 = single pass; else the K/V chunk for the flash-tiled int8 path.
    Raises only when even the linear (chunk-independent) footprint cannot
    fit — the qkv tensor itself is VMEM-resident in this kernel."""
    if int8_attention_fits(N, D):
        return 0
    n_pad = _round_up(N, 8)
    chunk = _FLASH_CHUNK
    need = _int8_attn_linear_bytes(N, D) + 3 * n_pad * chunk * 4
    if need > _VMEM_LIMIT:
        raise ValueError(
            f"fused_attention_qkv_int8: even the flash-tiled path needs "
            f"~{need >> 20} MiB of VMEM at N={N}, D={D} — use the unfused "
            f"QDense composition and shard the sequence"
        )
    return chunk


def fused_attention_qkv_int8(
    x: jnp.ndarray,
    wq_qkv: jnp.ndarray,
    qkv_w_scale: jnp.ndarray,
    qkv_bias: jnp.ndarray,
    qkv_act_scale,
    wq_proj: jnp.ndarray,
    proj_w_scale: jnp.ndarray,
    proj_bias: jnp.ndarray,
    proj_act_scale,
    num_heads: int,
    *,
    scale: Optional[float] = None,
    ln_scale: Optional[jnp.ndarray] = None,
    ln_bias: Optional[jnp.ndarray] = None,
    ln_eps: float = 1e-6,
    layerscale: Optional[jnp.ndarray] = None,
    residual: bool = False,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Quantized-serving attention sublayer: same math as
    ``[LayerNorm ->] QDense(qkv) -> fused_attention_qkv -> QDense(proj)
    [-> * layerscale] [-> + x]`` but in ONE kernel — both projections run
    on the int8 MXU and nothing between the residual-stream input and
    the (optionally residual-added) output touches HBM. Inference-only.

    x: (B, N, D) activations (bf16); wq_*: int8 weights with per-out-
    channel scales; *_act_scale: calibrated per-tensor input scales.
    Returns (B, N, D) bf16 (the new residual stream when
    ``residual=True``).
    """
    B, N, D = x.shape
    H = num_heads
    hd = D // H
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k_chunk = _int8_attn_k_chunk(N, D)  # raises if nothing fits
    sc = float(scale) if scale is not None else 1.0 / float(hd) ** 0.5
    fold_ln = ln_scale is not None
    in_specs = [pl.BlockSpec((1, N, D), lambda b: (b, 0, 0))]
    inputs = [x.astype(jnp.bfloat16)]
    if fold_ln:
        in_specs += [
            pl.BlockSpec((1, D), lambda b: (0, 0)),
            pl.BlockSpec((1, D), lambda b: (0, 0)),
        ]
        inputs += [
            ln_scale.astype(jnp.float32).reshape(1, D),
            ln_bias.astype(jnp.float32).reshape(1, D),
        ]
    in_specs += [
        pl.BlockSpec((D, 3 * D), lambda b: (0, 0)),
        pl.BlockSpec((1, 3 * D), lambda b: (0, 0)),
        pl.BlockSpec((1, 3 * D), lambda b: (0, 0)),
        pl.BlockSpec((D, D), lambda b: (0, 0)),
        pl.BlockSpec((1, D), lambda b: (0, 0)),
        pl.BlockSpec((1, D), lambda b: (0, 0)),
    ]
    inputs += [
        wq_qkv,
        qkv_w_scale.astype(jnp.float32).reshape(1, 3 * D),
        qkv_bias.astype(jnp.float32).reshape(1, 3 * D), wq_proj,
        proj_w_scale.astype(jnp.float32).reshape(1, D),
        proj_bias.astype(jnp.float32).reshape(1, D),
    ]
    if layerscale is not None:
        in_specs.append(pl.BlockSpec((1, D), lambda b: (0, 0)))
        inputs.append(layerscale.astype(jnp.bfloat16).reshape(1, D))
    return pl.pallas_call(
        functools.partial(
            _attn_int8_kernel, scale=sc, H=H, hd=hd, D=D,
            a_qkv=float(qkv_act_scale), a_proj=float(proj_act_scale),
            ln_eps=float(ln_eps) if fold_ln else 0.0,
            has_ls=layerscale is not None, residual=residual,
            k_chunk=k_chunk,
        ),
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, N, D), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(*inputs)


def _bf16_attn_k_chunk(N: int, D: int) -> int:
    """Chunk selection for the bf16 block kernel (weights 2 bytes)."""
    n_pad = _round_up(N, 8)
    if _int8_attn_linear_bytes(N, D, 2) + 3 * n_pad * n_pad * 4 <= _VMEM_LIMIT:
        return 0
    chunk = _FLASH_CHUNK
    need = _int8_attn_linear_bytes(N, D, 2) + 3 * n_pad * chunk * 4
    if need > _VMEM_LIMIT:
        raise ValueError(
            f"fused_attention_block_bf16: even the flash-tiled path needs "
            f"~{need >> 20} MiB of VMEM at N={N}, D={D} — use the unfused "
            f"composition and shard the sequence"
        )
    return chunk


def fused_attention_block_bf16(
    x: jnp.ndarray,
    w_qkv: jnp.ndarray,
    qkv_bias: jnp.ndarray,
    w_proj: jnp.ndarray,
    proj_bias: jnp.ndarray,
    num_heads: int,
    *,
    scale: Optional[float] = None,
    ln_scale: Optional[jnp.ndarray] = None,
    ln_bias: Optional[jnp.ndarray] = None,
    ln_eps: float = 1e-6,
    layerscale: Optional[jnp.ndarray] = None,
    residual: bool = False,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Float-serving attention half-block: the ``quant=False`` variant of
    ``fused_attention_qkv_int8`` — bf16 weights, bf16 MXU dots with f32
    accumulation, with the same optional LayerNorm / LayerScale /
    residual folds. Inference-only (no VJP); for training use
    ``fused_attention_qkv``. Returns (B, N, D) bf16."""
    B, N, D = x.shape
    H = num_heads
    hd = D // H
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k_chunk = _bf16_attn_k_chunk(N, D)  # raises if nothing fits
    sc = float(scale) if scale is not None else 1.0 / float(hd) ** 0.5
    fold_ln = ln_scale is not None
    in_specs = [pl.BlockSpec((1, N, D), lambda b: (b, 0, 0))]
    inputs = [x.astype(jnp.bfloat16)]
    if fold_ln:
        in_specs += [
            pl.BlockSpec((1, D), lambda b: (0, 0)),
            pl.BlockSpec((1, D), lambda b: (0, 0)),
        ]
        inputs += [
            ln_scale.astype(jnp.float32).reshape(1, D),
            ln_bias.astype(jnp.float32).reshape(1, D),
        ]
    in_specs += [
        pl.BlockSpec((D, 3 * D), lambda b: (0, 0)),
        pl.BlockSpec((1, 3 * D), lambda b: (0, 0)),
        pl.BlockSpec((D, D), lambda b: (0, 0)),
        pl.BlockSpec((1, D), lambda b: (0, 0)),
    ]
    inputs += [
        w_qkv.astype(jnp.bfloat16),
        qkv_bias.astype(jnp.float32).reshape(1, 3 * D),
        w_proj.astype(jnp.bfloat16),
        proj_bias.astype(jnp.float32).reshape(1, D),
    ]
    if layerscale is not None:
        in_specs.append(pl.BlockSpec((1, D), lambda b: (0, 0)))
        inputs.append(layerscale.astype(jnp.bfloat16).reshape(1, D))
    return pl.pallas_call(
        functools.partial(
            _attn_int8_kernel, scale=sc, H=H, hd=hd, D=D,
            a_qkv=1.0, a_proj=1.0, quant=False,
            ln_eps=float(ln_eps) if fold_ln else 0.0,
            has_ls=layerscale is not None, residual=residual,
            k_chunk=k_chunk,
        ),
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, N, D), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(*inputs)


def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    bh_block: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Self-attention ``softmax(q @ k^T * scale) @ v`` fused in VMEM.

    q, k, v: (B, H, N, hd); returns (B, H, N, hd) in q's dtype. Softmax is
    computed in f32 on-chip (never hits HBM). Inference-only.
    """
    B, H, N, hd = q.shape
    if scale is None:
        scale = 1.0 / float(hd) ** 0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    BH = B * H
    if bh_block is None:
        bh_block = next((c for c in (8, 4, 2, 1) if BH % c == 0), 1)
    n_pad = _round_up(N, 16)
    pad = ((0, 0), (0, 0), (0, n_pad - N), (0, 0))
    q_p = jnp.pad(q, pad).reshape(BH, n_pad, hd)
    k_p = jnp.pad(k, pad).reshape(BH, n_pad, hd)
    v_p = jnp.pad(v, pad).reshape(BH, n_pad, hd)

    spec = pl.BlockSpec((bh_block, n_pad, hd), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(
            _attn_kernel, scale=float(scale), n_valid=N, n_pad=n_pad,
            bh_block=bh_block,
        ),
        grid=(BH // bh_block,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((BH, n_pad, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(q_p, k_p, v_p)
    return out.reshape(B, H, n_pad, hd)[:, :, :N, :]
