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

Scope: inference-only (no VJP), self-attention, no attention mask beyond
sequence-length padding. The ViT serving path (``models/quantize.py``
``QuantizedViT.apply``) uses it; it is also a public op for any
encoder-style transformer at N up to ~1k (VMEM bound: N_pad^2 * 4 bytes).
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _attn_qkv_core(x, H: int, hd: int, interpret: bool):
    """x: (B, N, 3D) flat qkv; returns (B, N, D). scale fixed at
    1/sqrt(hd) (the transformer convention)."""
    return _attn_qkv_fwd_call(x, H, hd, interpret)


def _attn_qkv_fwd_call(x, H, hd, interpret):
    B, N, threeD = x.shape
    D = threeD // 3
    return pl.pallas_call(
        functools.partial(
            _attn_qkv_kernel, scale=1.0 / float(hd) ** 0.5, H=H, hd=hd, D=D
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


def _attn_qkv_core_fwd(x, H, hd, interpret):
    return _attn_qkv_fwd_call(x, H, hd, interpret), (x,)


def _attn_qkv_core_bwd(H, hd, interpret, residuals, g):
    (x,) = residuals
    B, N, threeD = x.shape
    D = threeD // 3
    dqkv = pl.pallas_call(
        functools.partial(
            _attn_qkv_bwd_kernel, scale=1.0 / float(hd) ** 0.5, H=H, hd=hd,
            D=D,
        ),
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

    Differentiable: a custom VJP recomputes probs per batch row in VMEM
    (flash-style — only qkv is saved) and runs the softmax-attention
    backward as one more Pallas kernel, so ``attn_impl='fused'`` works for
    finetuning too. When N is too long for the whole (N, N) score matrix
    to live in VMEM, the kernel switches to a flash-tiled online-softmax
    sweep over K/V chunks — that long-sequence path (and a non-default
    ``scale``) is forward-only.
    """
    B, N, three, H, hd = qkv.shape
    assert three == 3 and H == num_heads
    D = H * hd
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k_chunk = _select_k_chunk(N, D, qkv.dtype.itemsize)

    x = qkv.reshape(B, N, 3 * D)  # free reshape (contiguous)
    if scale is None and k_chunk == 0:
        return _attn_qkv_core(x, H, hd, interpret)
    # Flash-tiled long-sequence path or custom scale: forward-only.
    return pl.pallas_call(
        functools.partial(
            _attn_qkv_kernel,
            scale=float(scale) if scale is not None else 1.0 / float(hd) ** 0.5,
            H=H, hd=hd, D=D, k_chunk=k_chunk,
        ),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, N, 3 * D), lambda b: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, N, D), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, D), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(x)


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
