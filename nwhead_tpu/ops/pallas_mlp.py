"""Fused transformer-MLP Pallas kernel (inference).

fc1 -> exact GELU -> fc2 in one pass: the hidden (tokens, 4D) activation
lives only in VMEM. XLA's unfused chain writes it to HBM twice around the
GELU (measured ~350 us/block of glue vs ~155 us of matmul for ViT-S/14 at
B=64 — scripts/vit_lab.py). Weights are revisited blocks (constant index
maps), so Mosaic keeps them resident across token tiles.

Inference-only (no VJP). Used by ``models/vit.py`` (``mlp_impl='fused'``)
and the quantized ViT serving path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 100 * 1024 * 1024  # v5e has 128 MiB; leave headroom


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7 — below
    f32 noise downstream). Mosaic has no erf primitive; this uses only
    exp and polynomials (all VPU-lowerable)."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    h = jax.lax.dot_general(
        x_ref[:], w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0]
    # Exact (erf-based) GELU in f32, entirely in VMEM.
    h = 0.5 * h * (1.0 + _erf(h * (0.5 ** 0.5)))
    h = h.astype(x_ref.dtype)
    out = jax.lax.dot_general(
        h, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0]
    out_ref[:] = out.astype(out_ref.dtype)


def fused_mlp(
    x: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    *,
    block_m: int = 512,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """``gelu(x @ w1 + b1) @ w2 + b2`` with the hidden activation kept in
    VMEM. x: (..., D_in); w1: (D_in, D_h); w2: (D_h, D_out)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    orig_shape = x.shape
    D_in = orig_shape[-1]
    D_h = w1.shape[1]
    D_out = w2.shape[1]
    xf = x.reshape(-1, D_in)
    M = xf.shape[0]
    m_pad = _round_up(M, block_m)
    if m_pad != M:
        xf = jnp.pad(xf, ((0, m_pad - M), (0, 0)))
    dt = x.dtype
    w1 = w1.astype(dt)
    w2 = w2.astype(dt)
    b1 = b1.astype(jnp.float32).reshape(1, D_h)
    b2 = b2.astype(jnp.float32).reshape(1, D_out)

    out = pl.pallas_call(
        _mlp_kernel,
        grid=(m_pad // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, D_in), lambda i: (i, 0)),
            pl.BlockSpec((D_in, D_h), lambda i: (0, 0)),
            pl.BlockSpec((1, D_h), lambda i: (0, 0)),
            pl.BlockSpec((D_h, D_out), lambda i: (0, 0)),
            pl.BlockSpec((1, D_out), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, D_out), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m_pad, D_out), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(xf, w1, b1, w2, b2)
    return out[:M].reshape(*orig_shape[:-1], D_out)
