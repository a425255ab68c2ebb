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


_INV_SQRT_2PI = 0.3989422804014327


def _mlp_bwd_kernel(
    x_ref, w1_ref, b1_ref, w2_ref, b2_ref, do_ref,
    dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
    dw1_acc, db1_acc, dw2_acc, db2_acc,
    *, n_m_tiles: int,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dw1_acc[:] = jnp.zeros_like(dw1_acc)
        db1_acc[:] = jnp.zeros_like(db1_acc)
        dw2_acc[:] = jnp.zeros_like(dw2_acc)
        db2_acc[:] = jnp.zeros_like(db2_acc)

    x = x_ref[:]        # (TM, Din)
    do = do_ref[:]      # (TM, Dout)
    # Recompute forward intermediates (flash-style: nothing saved).
    h = jax.lax.dot_general(
        x, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0]
    cdf = 0.5 * (1.0 + _erf(h * (0.5 ** 0.5)))
    g = (h * cdf).astype(x.dtype)  # gelu(h)

    # dg = dO @ w2^T; dh = dg * gelu'(h);  gelu' = cdf + h * pdf.
    dg = jax.lax.dot_general(
        do, w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    pdf = jnp.exp(-0.5 * h * h) * _INV_SQRT_2PI
    dh = (dg * (cdf + h * pdf)).astype(x.dtype)

    dx_ref[:] = jax.lax.dot_general(
        dh, w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dx_ref.dtype)

    # Weight/bias grads accumulate across token tiles (dim-0 contractions;
    # bias sums ride a ones-vector matmul to avoid relayouts).
    dw1_acc[:] += jax.lax.dot_general(
        x, dh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dw2_acc[:] += jax.lax.dot_general(
        g, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    ones = jnp.ones((x.shape[0], 1), x.dtype)
    db1_acc[:] += jax.lax.dot_general(
        ones, dh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db2_acc[:] += jax.lax.dot_general(
        ones, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(i == n_m_tiles - 1)
    def _finalize():
        dw1_ref[:] = dw1_acc[:].astype(dw1_ref.dtype)
        db1_ref[:] = db1_acc[:].astype(db1_ref.dtype)
        dw2_ref[:] = dw2_acc[:].astype(dw2_ref.dtype)
        db2_ref[:] = db2_acc[:].astype(db2_ref.dtype)


def _mlp_call(xf, w1, b1, w2, b2, *, block_m, interpret):
    m_pad, D_in = xf.shape
    D_h = w1.shape[1]
    D_out = w2.shape[1]
    return pl.pallas_call(
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
        out_shape=jax.ShapeDtypeStruct((m_pad, D_out), xf.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(xf, w1, b1, w2, b2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _mlp_core(xf, w1, b1, w2, b2, block_m, interpret):
    return _mlp_call(xf, w1, b1, w2, b2, block_m=block_m, interpret=interpret)


def _mlp_core_fwd(xf, w1, b1, w2, b2, block_m, interpret):
    out = _mlp_call(xf, w1, b1, w2, b2, block_m=block_m, interpret=interpret)
    return out, (xf, w1, b1, w2, b2)


def _mlp_core_bwd(block_m, interpret, residuals, g):
    xf, w1, b1, w2, b2 = residuals
    m_pad, D_in = xf.shape
    D_h = w1.shape[1]
    D_out = w2.shape[1]
    n_m = m_pad // block_m
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_mlp_bwd_kernel, n_m_tiles=n_m),
        grid=(n_m,),
        in_specs=[
            pl.BlockSpec((block_m, D_in), lambda i: (i, 0)),
            pl.BlockSpec((D_in, D_h), lambda i: (0, 0)),
            pl.BlockSpec((1, D_h), lambda i: (0, 0)),
            pl.BlockSpec((D_h, D_out), lambda i: (0, 0)),
            pl.BlockSpec((1, D_out), lambda i: (0, 0)),
            pl.BlockSpec((block_m, D_out), lambda i: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((block_m, D_in), lambda i: (i, 0)),
            pl.BlockSpec((D_in, D_h), lambda i: (0, 0)),
            pl.BlockSpec((1, D_h), lambda i: (0, 0)),
            pl.BlockSpec((D_h, D_out), lambda i: (0, 0)),
            pl.BlockSpec((1, D_out), lambda i: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, D_in), xf.dtype),
            jax.ShapeDtypeStruct((D_in, D_h), w1.dtype),
            jax.ShapeDtypeStruct((1, D_h), b1.dtype),
            jax.ShapeDtypeStruct((D_h, D_out), w2.dtype),
            jax.ShapeDtypeStruct((1, D_out), b2.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((D_in, D_h), jnp.float32),
            pltpu.VMEM((1, D_h), jnp.float32),
            pltpu.VMEM((D_h, D_out), jnp.float32),
            pltpu.VMEM((1, D_out), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(xf, w1, b1, w2, b2, g.astype(xf.dtype))
    return dx, dw1, db1, dw2, db2


_mlp_core.defvjp(_mlp_core_fwd, _mlp_core_bwd)


def _mlp_int8_kernel(x_ref, *refs, a1: float, a2: float,
                     ln_eps: float = 0.0, has_ls: bool = False,
                     residual: bool = False, quant: bool = True):
    """Fully fused MLP half-block: [optional LayerNorm ->] fc1 -> exact
    GELU -> fc2 [-> LayerScale -> residual], every intermediate in VMEM.
    ``quant=True``: both matmuls as quantize -> int8 MXU dot ->
    dequant+bias with calibrated a1/a2 input scales; ``quant=False``:
    bf16 weights, bf16 MXU dots with f32 accumulation (float serving).
    Folding the LN saves its (tokens, D) HBM round trip (LN is
    per-token, so it tiles with the flattened token axis)."""
    i = 0
    ln_s_ref = ln_b_ref = None
    if ln_eps > 0.0:
        ln_s_ref = refs[i]; i += 1   # (1, D_in) f32
        ln_b_ref = refs[i]; i += 1   # (1, D_in) f32
    s1_ref = s2_ref = None
    wq1_ref = refs[i]; i += 1
    if quant:
        s1_ref = refs[i]; i += 1
    b1_ref = refs[i]; i += 1
    wq2_ref = refs[i]; i += 1
    if quant:
        s2_ref = refs[i]; i += 1
    b2_ref = refs[i]; i += 1
    ls_ref = None
    if has_ls:
        ls_ref = refs[i]; i += 1   # (1, D_out) bf16 LayerScale gamma
    out_ref = refs[i]; i += 1

    xf = x_ref[:].astype(jnp.float32)
    if ln_eps > 0.0:
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        xf = (xf - mean) * jax.lax.rsqrt(var + ln_eps) * ln_s_ref[0] \
            + ln_b_ref[0]
        # bf16 round-trip matches the unfused (Q)LayerNorm -> fc1 chain.
        xf = xf.astype(jnp.bfloat16).astype(jnp.float32)
    if quant:
        x8 = jnp.clip(
            jnp.round(xf * (1.0 / a1)), -127, 127
        ).astype(jnp.int8)
        h = jax.lax.dot_general(
            x8, wq1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (a1 * s1_ref[0]) + b1_ref[0]
    else:
        h = jax.lax.dot_general(
            xf.astype(jnp.bfloat16), wq1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[0]
    h = 0.5 * h * (1.0 + _erf(h * (0.5 ** 0.5)))  # exact GELU, f32
    if quant:
        g8 = jnp.clip(jnp.round(h * (1.0 / a2)), -127, 127).astype(jnp.int8)
        out = jax.lax.dot_general(
            g8, wq2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (a2 * s2_ref[0]) + b2_ref[0]
    else:
        out = jax.lax.dot_general(
            h.astype(jnp.bfloat16), wq2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2_ref[0]
    # Tail folds, matching the XLA chain's bf16 residual-stream math:
    # out_bf16 [* ls] [+ x] (residual requires D_out == D_in).
    out = out.astype(out_ref.dtype)
    if has_ls:
        out = out * ls_ref[0]
    if residual:
        out = x_ref[:].astype(out_ref.dtype) + out
    out_ref[:] = out


def fused_mlp_int8(
    x: jnp.ndarray,
    wq1: jnp.ndarray,
    w1_scale: jnp.ndarray,
    b1: jnp.ndarray,
    act_scale1,
    wq2: jnp.ndarray,
    w2_scale: jnp.ndarray,
    b2: jnp.ndarray,
    act_scale2,
    *,
    ln_scale: Optional[jnp.ndarray] = None,
    ln_bias: Optional[jnp.ndarray] = None,
    ln_eps: float = 1e-6,
    layerscale: Optional[jnp.ndarray] = None,
    residual: bool = False,
    block_m: int = 512,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Quantized-serving MLP: same math as two ``QDense`` calls around a
    GELU, but fused — the requantize chains and the 4D hidden activation
    never touch HBM, and both matmuls run on the int8 MXU path. Pass
    ``ln_scale``/``ln_bias`` to fold the pre-MLP LayerNorm in-kernel,
    ``layerscale``/``residual=True`` to fold the output tail (requires
    D_out == D_in for the residual). Inference-only. Returns bf16."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    orig_shape = x.shape
    D_in = orig_shape[-1]
    D_h = wq1.shape[1]
    D_out = wq2.shape[1]
    xf = x.reshape(-1, D_in)
    M = xf.shape[0]
    block_m = min(block_m, _round_up(M, 8))
    m_pad = _round_up(M, block_m)
    if m_pad != M:
        xf = jnp.pad(xf, ((0, m_pad - M), (0, 0)))
    fold_ln = ln_scale is not None
    in_specs = [pl.BlockSpec((block_m, D_in), lambda i: (i, 0))]
    inputs = [xf]
    if fold_ln:
        in_specs += [
            pl.BlockSpec((1, D_in), lambda i: (0, 0)),
            pl.BlockSpec((1, D_in), lambda i: (0, 0)),
        ]
        inputs += [
            ln_scale.astype(jnp.float32).reshape(1, D_in),
            ln_bias.astype(jnp.float32).reshape(1, D_in),
        ]
    in_specs += [
        pl.BlockSpec((D_in, D_h), lambda i: (0, 0)),
        pl.BlockSpec((1, D_h), lambda i: (0, 0)),
        pl.BlockSpec((1, D_h), lambda i: (0, 0)),
        pl.BlockSpec((D_h, D_out), lambda i: (0, 0)),
        pl.BlockSpec((1, D_out), lambda i: (0, 0)),
        pl.BlockSpec((1, D_out), lambda i: (0, 0)),
    ]
    inputs += [
        wq1, w1_scale.astype(jnp.float32).reshape(1, D_h),
        b1.astype(jnp.float32).reshape(1, D_h), wq2,
        w2_scale.astype(jnp.float32).reshape(1, D_out),
        b2.astype(jnp.float32).reshape(1, D_out),
    ]
    if residual and D_out != D_in:
        raise ValueError("residual=True requires D_out == D_in")
    if layerscale is not None:
        in_specs.append(pl.BlockSpec((1, D_out), lambda i: (0, 0)))
        inputs.append(layerscale.astype(jnp.bfloat16).reshape(1, D_out))
    out = pl.pallas_call(
        functools.partial(
            _mlp_int8_kernel, a1=float(act_scale1), a2=float(act_scale2),
            ln_eps=float(ln_eps) if fold_ln else 0.0,
            has_ls=layerscale is not None, residual=residual,
        ),
        grid=(m_pad // block_m,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, D_out), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m_pad, D_out), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(*inputs)
    return out[:M].reshape(*orig_shape[:-1], D_out)


def fused_mlp_block_bf16(
    x: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    *,
    ln_scale: Optional[jnp.ndarray] = None,
    ln_bias: Optional[jnp.ndarray] = None,
    ln_eps: float = 1e-6,
    layerscale: Optional[jnp.ndarray] = None,
    residual: bool = False,
    block_m: int = 512,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Float-serving MLP half-block: the ``quant=False`` variant of
    ``fused_mlp_int8`` — bf16 weights, bf16 MXU dots with f32
    accumulation, exact (erf) GELU in f32, with the same optional
    LayerNorm / LayerScale / residual folds. Inference-only (no VJP);
    for training use ``fused_mlp``. Returns bf16."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    orig_shape = x.shape
    D_in = orig_shape[-1]
    D_h = w1.shape[1]
    D_out = w2.shape[1]
    xf = x.reshape(-1, D_in).astype(jnp.bfloat16)
    M = xf.shape[0]
    block_m = min(block_m, _round_up(M, 8))
    m_pad = _round_up(M, block_m)
    if m_pad != M:
        xf = jnp.pad(xf, ((0, m_pad - M), (0, 0)))
    fold_ln = ln_scale is not None
    in_specs = [pl.BlockSpec((block_m, D_in), lambda i: (i, 0))]
    inputs = [xf]
    if fold_ln:
        in_specs += [
            pl.BlockSpec((1, D_in), lambda i: (0, 0)),
            pl.BlockSpec((1, D_in), lambda i: (0, 0)),
        ]
        inputs += [
            ln_scale.astype(jnp.float32).reshape(1, D_in),
            ln_bias.astype(jnp.float32).reshape(1, D_in),
        ]
    in_specs += [
        pl.BlockSpec((D_in, D_h), lambda i: (0, 0)),
        pl.BlockSpec((1, D_h), lambda i: (0, 0)),
        pl.BlockSpec((D_h, D_out), lambda i: (0, 0)),
        pl.BlockSpec((1, D_out), lambda i: (0, 0)),
    ]
    inputs += [
        w1.astype(jnp.bfloat16), b1.astype(jnp.float32).reshape(1, D_h),
        w2.astype(jnp.bfloat16), b2.astype(jnp.float32).reshape(1, D_out),
    ]
    if residual and D_out != D_in:
        raise ValueError("residual=True requires D_out == D_in")
    if layerscale is not None:
        in_specs.append(pl.BlockSpec((1, D_out), lambda i: (0, 0)))
        inputs.append(layerscale.astype(jnp.bfloat16).reshape(1, D_out))
    out = pl.pallas_call(
        functools.partial(
            _mlp_int8_kernel, a1=1.0, a2=1.0, quant=False,
            ln_eps=float(ln_eps) if fold_ln else 0.0,
            has_ls=layerscale is not None, residual=residual,
        ),
        grid=(m_pad // block_m,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, D_out), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m_pad, D_out), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(*inputs)
    return out[:M].reshape(*orig_shape[:-1], D_out)


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
    VMEM. x: (..., D_in); w1: (D_in, D_h); w2: (D_h, D_out).

    Differentiable: the custom VJP recomputes the hidden activation per
    token tile (flash-style) and accumulates weight/bias grads across tiles
    in a second Pallas kernel — ``mlp_impl='fused'`` trains too."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    orig_shape = x.shape
    D_in = orig_shape[-1]
    D_h = w1.shape[1]
    D_out = w2.shape[1]
    xf = x.reshape(-1, D_in)
    M = xf.shape[0]
    block_m = min(block_m, _round_up(M, 8))
    m_pad = _round_up(M, block_m)
    if m_pad != M:
        xf = jnp.pad(xf, ((0, m_pad - M), (0, 0)))
    dt = x.dtype
    out = _mlp_core(
        xf, w1.astype(dt), b1.astype(jnp.float32).reshape(1, D_h),
        w2.astype(dt), b2.astype(jnp.float32).reshape(1, D_out),
        block_m, interpret,
    )
    return out[:M].reshape(*orig_shape[:-1], D_out)
