"""Fused ResNet BasicBlock pair (layer1) as one Pallas kernel — inference.

XLA runs resnet18's layer1 (two 64->64 BasicBlocks at 56x56) at ~28% MXU
utilization and round-trips every intermediate through HBM (~1.07 ms of the
2.59 ms featurizer at B=64). This kernel keeps the whole activation resident
in VMEM: per grid step (one image), it runs conv1->bn->relu->conv2->bn->
+residual->relu twice, with each 3x3 conv expressed as 9 static-offset tap
matmuls over a zero-haloed (64, 64, C) layout (BN folded into weights/bias
at eval time).

Lab: parity vs the flax blocks (CPU interpret), then TPU timing vs XLA.
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

# Padded layout: image (56, 56, C) lives at rows/cols [2, 58) of a (64, 64, C)
# zero grid, flattened to (4096, C). Output region = flat rows [128, 3712).
GRID = 64
IMG = 56
OFF = 2
REGION = IMG * GRID  # 3584 rows cover all (r, c) with r in [2, 58)
R0 = OFF * GRID      # 128


def _interior_mask():
    """(REGION, 1) f32: 1 where the flat position is a real image pixel."""
    k = jax.lax.broadcasted_iota(jnp.int32, (REGION, 1), 0) + R0
    c = jax.lax.rem(k, GRID)
    return jnp.logical_and(c >= OFF, c < OFF + IMG).astype(jnp.float32)
    # rows are guaranteed in [2, 58) by the region bounds.


_TAP_OFFSETS = [(dy * GRID + dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


_CONV_IMPL = os.environ.get("BLOCK_CONV_IMPL", "im2col")


def _conv3x3(read, w_ref, conv_idx: int, C: int):
    """9-tap conv over the padded layout: (REGION, C) f32 accumulation.
    ``read(lo, hi)`` loads flat rows [lo, hi) of the source buffer.
    w_ref: (2*n_blocks, 9*C, C) bf16 folded weights, tap t stored TRANSPOSED
    (C_out, C_in) so the dot contracts both operands on dim 1 (no relayout).

    impl 'taps': 9 small K=C matmuls (per-matmul overhead dominates).
    impl 'im2col': concat the 9 shifted reads along lanes -> ONE K=9C matmul.
    """
    if _CONV_IMPL == "im2col":
        x_cat = jnp.concatenate(
            [read(R0 + off, R0 + off + REGION) for off in _TAP_OFFSETS],
            axis=1,
        )  # (REGION, 9C)
        return jax.lax.dot_general(
            x_cat, w_ref[conv_idx], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if _CONV_IMPL == "dy3":
        # Taps sharing dx have identical sublane phase (offsets differ by
        # +-64 = whole vregs), so the lane-concat is legal: 3 matmuls of
        # K=3C instead of 9 of K=C.
        acc = None
        for j, dx in enumerate((-1, 0, 1)):
            x_cat = jnp.concatenate(
                [
                    read(R0 + dy * GRID + dx, R0 + dy * GRID + dx + REGION)
                    for dy in (-1, 0, 1)
                ],
                axis=1,
            )  # (REGION, 3C)
            d = jax.lax.dot_general(
                x_cat, w_ref[conv_idx, j * C:(j + 1) * C, :],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = d if acc is None else acc + d
        return acc
    acc = None
    for t, off in enumerate(_TAP_OFFSETS):
        x_t = read(R0 + off, R0 + off + REGION)
        w_t = w_ref[conv_idx, t * C:(t + 1) * C, :]
        d = jax.lax.dot_general(
            x_t, w_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = d if acc is None else acc + d
    return acc


def _block_pair_kernel(x_ref, w_ref, b_ref, out_ref, buf_ref, *, n_blocks):
    """x_ref: (1, 4096, C) bf16 padded layout; out_ref same.
    buf_ref: (2, 4096, C) scratch (tmp = slot 0, inter-block = slot 1).
    Both scratch slots are fully zeroed once; all writes go to the flat
    region [R0, R0+REGION) with non-image columns masked to zero, so halos
    stay zero across blocks (3x3 conv pad=1 semantics)."""
    C = x_ref.shape[-1]
    mask = _interior_mask()
    buf_ref[:] = jnp.zeros_like(buf_ref)

    def read_x(lo, hi):
        return x_ref[0, lo:hi, :]

    def read_buf(slot):
        return lambda lo, hi: buf_ref[slot, lo:hi, :]

    for blk in range(n_blocks):
        src = read_x if blk == 0 else read_buf(1)
        h = _conv3x3(src, w_ref, 2 * blk, C)
        h = jnp.maximum(h + b_ref[2 * blk, :1, :], 0.0)
        buf_ref[0, R0:R0 + REGION, :] = (h * mask).astype(x_ref.dtype)

        h2 = _conv3x3(read_buf(0), w_ref, 2 * blk + 1, C)
        h2 = h2 + b_ref[2 * blk + 1, :1, :]
        resid = src(R0, R0 + REGION).astype(jnp.float32)
        out = jnp.maximum(h2 + resid, 0.0) * mask
        if blk == n_blocks - 1:
            out_ref[0] = jnp.zeros_like(out_ref[0])
            out_ref[0, R0:R0 + REGION, :] = out.astype(x_ref.dtype)
        else:
            buf_ref[1, R0:R0 + REGION, :] = out.astype(x_ref.dtype)


def fold_bn(w_hwio, scale, bias, mean, var, eps=1e-5):
    """conv -> BN(eval) == conv with folded weights + bias."""
    a = scale / np.sqrt(var + eps)
    w = np.asarray(w_hwio) * a[None, None, None, :]
    b = bias - mean * a
    return w, b


def pack_weights(folded):
    """folded: list of (w (3,3,C,C), b (C,)) per conv, len 2*n_blocks.
    Returns w_packed (2n, 9C, C) bf16 with tap t rows = w[dy,dx].T (C_out,
    C_in) so the kernel's dot contracts both operands on their dim 1, and
    b_packed (2n, 128, C) f32."""
    n = len(folded)
    C = folded[0][0].shape[-1]
    if _CONV_IMPL == "im2col":
        # (C_out, 9C): W2[o, t*C + cin] = w[tap t][cin, o]
        w_packed = np.zeros((n, C, 9 * C), np.float32)
    elif _CONV_IMPL == "dy3":
        # group j (= dx index) at rows [j*C,(j+1)*C): (C_out, 3C_in) with
        # cols ordered dy-major to match the kernel's concat.
        w_packed = np.zeros((n, 3 * C, 3 * C), np.float32)
    else:
        w_packed = np.zeros((n, 9 * C, C), np.float32)
    b_packed = np.zeros((n, 128, C), np.float32)
    for i, (w, b) in enumerate(folded):
        for t, (dy, dx) in enumerate(
            [(dy, dx) for dy in range(3) for dx in range(3)]
        ):
            # tap offset (-1..1) order must match _TAP_OFFSETS
            if _CONV_IMPL == "im2col":
                w_packed[i, :, t * C:(t + 1) * C] = w[dy, dx].T
            elif _CONV_IMPL == "dy3":
                w_packed[i, dx * C:(dx + 1) * C, dy * C:(dy + 1) * C] = w[dy, dx].T
            else:
                w_packed[i, t * C:(t + 1) * C, :] = w[dy, dx].T  # (C_out, C_in)
        b_packed[i, :, :] = b[None, :]
    return (
        jnp.asarray(w_packed, jnp.bfloat16),
        jnp.asarray(b_packed, jnp.float32),
    )


def pad_layout(x):
    """(B, 56, 56, C) -> (B, 4096, C) padded flat layout."""
    B, H, W, C = x.shape
    xp = jnp.zeros((B, GRID, GRID, C), x.dtype)
    xp = xp.at[:, OFF:OFF + H, OFF:OFF + W, :].set(x)
    return xp.reshape(B, GRID * GRID, C)


def unpad_layout(xp):
    B, _, C = xp.shape
    x = xp.reshape(B, GRID, GRID, C)
    return x[:, OFF:OFF + IMG, OFF:OFF + IMG, :]


def fused_blocks(x, w_packed, b_packed, *, n_blocks=2, interpret=None):
    """x: (B, 56, 56, C) bf16 -> (B, 56, 56, C) bf16 through n_blocks
    BasicBlocks with folded BN."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, W, C = x.shape
    xp = pad_layout(x)
    out = pl.pallas_call(
        functools.partial(_block_pair_kernel, n_blocks=n_blocks),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, GRID * GRID, C), lambda i: (i, 0, 0)),
            pl.BlockSpec(w_packed.shape, lambda i: (0, 0, 0)),
            pl.BlockSpec(b_packed.shape, lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, GRID * GRID, C), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, GRID * GRID, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, GRID * GRID, C), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, w_packed, b_packed)
    return unpad_layout(out)


# ---------------------------------------------------------------------------


def _flax_reference(x, params, n_blocks=2):
    """Eval-mode flax BasicBlocks with the same (unfolded) params."""
    import flax.linen as nn

    from nwhead_tpu.models.resnet import BasicBlock

    h = x
    for i in range(n_blocks):
        blk = BasicBlock(planes=x.shape[-1], dtype=jnp.bfloat16)
        h = blk.apply(params[i], h, train=False)
    return h


def main():
    rng = np.random.default_rng(0)
    B, C = 8, 64
    x = jnp.asarray(
        rng.standard_normal((B, IMG, IMG, C)).astype(np.float32)
    ).astype(jnp.bfloat16)

    # Random BasicBlock params (flax init), then fold BN for the kernel.
    from nwhead_tpu.models.resnet import BasicBlock

    params = []
    folded = []
    for i in range(2):
        blk = BasicBlock(planes=C, dtype=jnp.bfloat16)
        v = blk.init(jax.random.PRNGKey(i), x[:1].astype(jnp.float32), train=False)
        # randomize BN stats so folding is actually exercised
        bs = v["batch_stats"]
        bs = jax.tree_util.tree_map(
            lambda a: jnp.asarray(rng.normal(0.3, 0.2, a.shape).astype(np.float32) ** 2 + 0.5)
            if a.ndim == 1 else a, bs)
        v = {"params": v["params"], "batch_stats": bs}
        params.append(v)
        for conv, bn in (("conv1", "bn1"), ("conv2", "bn2")):
            w = np.asarray(v["params"][conv]["kernel"])
            folded.append(fold_bn(
                w,
                np.asarray(v["params"][bn]["scale"]),
                np.asarray(v["params"][bn]["bias"]),
                np.asarray(v["batch_stats"][bn]["mean"]),
                np.asarray(v["batch_stats"][bn]["var"]),
            ))

    w_packed, b_packed = pack_weights(folded)
    got = np.asarray(fused_blocks(x, w_packed, b_packed)).astype(np.float32)
    want = np.asarray(_flax_reference(x, params)).astype(np.float32)
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
    print(f"parity vs flax blocks: max rel err {err:.2e}", flush=True)
    assert err < 2e-2, err  # bf16 tap-order differences

    if jax.default_backend() != "tpu":
        print("CPU-only run: parity checked, skipping timing")
        return

    # ---- timing vs XLA layer1 at B=64 -----------------------------------
    from scripts.kernel_lab import interleaved_time, _loop_maker

    B = 64
    x64 = jnp.asarray(
        rng.standard_normal((B, IMG, IMG, C)).astype(np.float32)
    ).astype(jnp.bfloat16)

    def xla_layer1(xx, p0, p1, carry):
        blk = BasicBlock(planes=C, dtype=jnp.bfloat16)
        h = blk.apply(p0, xx, train=False)
        return blk.apply(p1, h, train=False).astype(jnp.float32).mean()

    cases = [
        ("xla layer1", lambda n: _loop_maker(xla_layer1, n),
         (x64, params[0], params[1])),
        ("fused layer1", lambda n: _loop_maker(
            lambda xx, w, b, carry: fused_blocks(xx, w, b).astype(jnp.float32).mean(), n),
         (x64, w_packed, b_packed)),
    ]
    res = interleaved_time(cases, n1=40, n2=240, cycles=7)
    for name, t in res.items():
        print(f"{name}: {t*1e3:7.3f} ms/batch{B}", flush=True)


if __name__ == "__main__":
    main()
