"""Lab: is an int8 featurizer viable on v5e via XLA?

The e2e full-mode serving headline is featurizer-dominated (ResNet-18 bf16
B=64@224 = 2.59 ms vs 18.5 us head). v5e's MXU runs int8 at 2x bf16
throughput (394 vs 197 TOPS) — if XLA lowers s8xs8->s32 convs to that path,
a post-training-quantized serving featurizer is the single biggest e2e
lever left.

Measures per-conv-shape timings f32 vs bf16 vs int8 on the real TPU with the
differential interleaved-loop methodology (CLAUDE.md timing rules: the
loop-carried dependency rides lax.optimization_barrier; time = (loop(n2) -
loop(n1)) / (n2 - n1); variants sampled round-robin).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)
from timing import _loop_maker, interleaved_time  # noqa: E402,F401


def conv(x, w, stride, preferred=None):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred,
    )


def main():
    rng = np.random.default_rng(0)
    B = 64
    shapes = [
        ("stem7x7s2", 224, 224, 3, 64, 7, 2),
        ("l1_3x3", 56, 56, 64, 64, 3, 1),
        ("l2_3x3", 28, 28, 128, 128, 3, 1),
        ("l3_3x3", 14, 14, 256, 256, 3, 1),
        ("l4_3x3", 7, 7, 512, 512, 3, 1),
    ]
    print(f"backend={jax.default_backend()} B={B}", flush=True)
    for name, H, W, Cin, Cout, k, stride in shapes:
        x = rng.standard_normal((B, H, W, Cin)).astype(np.float32)
        w = (rng.standard_normal((k, k, Cin, Cout)) * 0.05).astype(np.float32)
        xj, wj = jnp.asarray(x), jnp.asarray(w)
        xb, wb = xj.astype(jnp.bfloat16), wj.astype(jnp.bfloat16)
        x8 = jnp.clip(jnp.round(xj * 10), -127, 127).astype(jnp.int8)
        w8 = jnp.clip(jnp.round(wj * 100), -127, 127).astype(jnp.int8)

        # The loop carry enters through the WEIGHTS (tiny add) and the sum
        # is re-barriered: conv is linear, so injecting the carry linearly
        # into a visible operand lets XLA distribute conv over the add and
        # hoist the real conv out of the loop (measured: impossible <10us
        # timings). The barrier AFTER the add makes the operand opaque.
        # ... and the OUTPUT is barriered before the reduction:
        # sum(conv(x, w)) is linear in w, so XLA folds the whole conv into
        # a precomputed patch-sum contraction otherwise.
        def f32_fn(xx, ww, carry, s=stride):
            w_dep = jax.lax.optimization_barrier(ww + carry.astype(ww.dtype))
            out = jax.lax.optimization_barrier(conv(xx, w_dep, s))
            return jnp.sum(out[:1, :1, :1].astype(jnp.float32)) * 1e-20

        def bf16_fn(xx, ww, carry, s=stride):
            w_dep = jax.lax.optimization_barrier(ww + carry.astype(ww.dtype))
            out = jax.lax.optimization_barrier(conv(xx, w_dep, s))
            return jnp.sum(out[:1, :1, :1].astype(jnp.float32)) * 1e-20

        def int8_fn(xx, ww, carry, s=stride):
            dw = (carry > 1e30).astype(jnp.int8)
            w_dep = jax.lax.optimization_barrier(ww + dw)
            out = jax.lax.optimization_barrier(conv(xx, w_dep, s, preferred=jnp.int32))
            return jnp.sum(out[:1, :1, :1].astype(jnp.float32)) * 1e-20

        makers = [("f32", f32_fn, (xj, wj)), ("bf16", bf16_fn, (xb, wb))]
        try:
            jax.jit(lambda a, b: conv(a, b, stride, jnp.int32)).lower(
                x8, w8
            ).compile()
            makers.append(("int8", int8_fn, (x8, w8)))
        except Exception as e:  # noqa: BLE001
            print(f"  {name}: int8 conv UNSUPPORTED: {type(e).__name__}: {e}",
                  flush=True)
        res = interleaved_time(makers)
        flops = 2 * B * (H // stride) * (W // stride) * k * k * Cin * Cout
        line = "  ".join(
            f"{n}={t * 1e6:7.1f}us ({flops / t / 197e12 * 100:4.1f}%)"
            for n, t in res.items()
        )
        print(f"  {name}: {line}", flush=True)


def stack():
    """Full ResNet-18 featurizer at B=64@224: bf16 flax vs int8 PTQ
    (models/quantize.py). The real e2e question."""
    import sys
    sys.path.insert(0, ".")
    from nwhead_tpu.models import load_model
    from nwhead_tpu.models.quantize import quantize_featurizer

    rng = np.random.default_rng(0)
    B = 64
    img = jnp.asarray(rng.standard_normal((B, 224, 224, 3)).astype(np.float32))
    model_bf16 = load_model("resnet18", dtype=jnp.bfloat16)
    model_f32 = load_model("resnet18")
    variables = model_f32.init(jax.random.PRNGKey(0), img[:1], train=False)
    q = quantize_featurizer(model_f32, variables, img[:32])

    def bf16_fn(xx, carry):
        x_dep = jax.lax.optimization_barrier(
            xx + carry.astype(xx.dtype) * 1e-30
        )
        out = jax.lax.optimization_barrier(
            model_bf16.apply(variables, x_dep, train=False)
        )
        return jnp.sum(out[:1, :1]) * 1e-20

    def int8_fn(xx, carry):
        x_dep = jax.lax.optimization_barrier(
            xx + carry.astype(xx.dtype) * 1e-30
        )
        out = jax.lax.optimization_barrier(q.apply(x_dep))
        return jnp.sum(out[:1, :1]) * 1e-20

    res = interleaved_time(
        [("bf16", bf16_fn, (img,)), ("int8", int8_fn, (img,))], cycles=7,
        target_s=0.1,
    )
    for name, t in res.items():
        print(f"  featurizer {name}: {t * 1e3:.3f} ms/batch-64 "
              f"({B / t:.0f} img/s)", flush=True)


def stem():
    """Stem variants at B=64@224: conv7/s2 bf16 vs s2d(4x4, Cin=12) bf16 vs
    s2d int8 — does the space-to-depth reparameterization pay off once the
    MXU runs int8?"""
    rng = np.random.default_rng(0)
    B = 64
    x = rng.standard_normal((B, 224, 224, 3)).astype(np.float32)
    xj = jnp.asarray(x)
    w7 = jnp.asarray((rng.standard_normal((7, 7, 3, 64)) * 0.05).astype(np.float32))
    w4 = jnp.asarray((rng.standard_normal((4, 4, 12, 64)) * 0.05).astype(np.float32))

    def s2d(t):
        Bb, H, W, C = t.shape
        t = t.reshape(Bb, H // 2, 2, W // 2, 2, C)
        return t.transpose(0, 1, 3, 2, 4, 5).reshape(Bb, H // 2, W // 2, 4 * C)

    def conv7_fn(xx, ww, carry):
        w_dep = jax.lax.optimization_barrier(ww + carry.astype(ww.dtype))
        out = jax.lax.optimization_barrier(
            jax.lax.conv_general_dilated(
                xx, w_dep, (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        )
        return jnp.sum(out[:1, :1, :1].astype(jnp.float32)) * 1e-20

    def s2d_fn(xx, ww, carry):
        w_dep = jax.lax.optimization_barrier(ww + carry.astype(ww.dtype))
        out = jax.lax.optimization_barrier(
            jax.lax.conv_general_dilated(
                s2d(xx), w_dep, (1, 1), ((2, 1), (2, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        )
        return jnp.sum(out[:1, :1, :1].astype(jnp.float32)) * 1e-20

    def s2d_int8_fn(xx, ww, carry):
        dw = (carry > 1e30).astype(jnp.int8)
        w_dep = jax.lax.optimization_barrier(ww + dw)
        out = jax.lax.optimization_barrier(
            jax.lax.conv_general_dilated(
                s2d(xx), w_dep, (1, 1), ((2, 1), (2, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
        )
        return jnp.sum(out[:1, :1, :1].astype(jnp.float32)) * 1e-20

    x8 = jnp.clip(jnp.round(xj * 50), -127, 127).astype(jnp.int8)
    w4_8 = jnp.clip(jnp.round(w4 * 500), -127, 127).astype(jnp.int8)
    res = interleaved_time([
        ("conv7_bf16", conv7_fn, (xj.astype(jnp.bfloat16), w7.astype(jnp.bfloat16))),
        ("s2d_bf16", s2d_fn, (xj.astype(jnp.bfloat16), w4.astype(jnp.bfloat16))),
        ("s2d_int8", s2d_int8_fn, (x8, w4_8)),
    ])
    for name, t in res.items():
        print(f"  stem {name}: {t * 1e6:.1f} us", flush=True)


def vit_stack(arch="vit_s14", B=64):
    """ViT at B@224 (the reference dinov2 shape): bf16 flax vs fully-fused
    bf16 (Pallas attention + MLP) vs int8 PTQ (fused int8 attention
    sublayer + fused int8 MLP — every Dense on the int8 MXU)."""
    import sys
    sys.path.insert(0, ".")
    from nwhead_tpu.models import load_model
    from nwhead_tpu.models.quantize import quantize_featurizer

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((B, 224, 224, 3)).astype(np.float32))
    model_bf16 = load_model(arch, dtype=jnp.bfloat16)
    model_bf16_fused = load_model(arch, dtype=jnp.bfloat16,
                                  attn_impl="fused", mlp_impl="fused")
    model_f32 = load_model(arch)
    variables = model_f32.init(jax.random.PRNGKey(0), img[:1], train=False)
    q = quantize_featurizer(model_f32, variables, img[:16])

    # Weights ride as loop-maker ARGUMENTS (not closures): closed-over
    # trees get inlined as HLO constants and the axon remote compile
    # service rejects ViT-B-scale constant bodies (HTTP 413).
    from nwhead_tpu.models.quantize import _qvit_forward
    from nwhead_tpu.models.serving_vit import _svit_forward, fuse_vit_serving

    statics, qtree = q.split()
    sgraph = fuse_vit_serving(model_f32, variables)
    s_statics, stree = sgraph.split()

    def bf16_fn(xx, vv, carry):
        x_dep = jax.lax.optimization_barrier(
            xx + carry.astype(xx.dtype) * 1e-30
        )
        out = jax.lax.optimization_barrier(
            model_bf16.apply(vv, x_dep, train=False)
        )
        return jnp.sum(out[:1, :1]) * 1e-20

    def bf16_fused_fn(xx, vv, carry):
        x_dep = jax.lax.optimization_barrier(
            xx + carry.astype(xx.dtype) * 1e-30
        )
        out = jax.lax.optimization_barrier(
            model_bf16_fused.apply(vv, x_dep, train=False)
        )
        return jnp.sum(out[:1, :1]) * 1e-20

    def int8_fn(xx, tr, carry):
        x_dep = jax.lax.optimization_barrier(
            xx + carry.astype(xx.dtype) * 1e-30
        )
        out = jax.lax.optimization_barrier(_qvit_forward(statics, tr, x_dep))
        return jnp.sum(out[:1, :1]) * 1e-20

    def bf16_block_fn(xx, tr, carry):
        x_dep = jax.lax.optimization_barrier(
            xx + carry.astype(xx.dtype) * 1e-30
        )
        out = jax.lax.optimization_barrier(
            _svit_forward(s_statics, tr, x_dep)
        )
        return jnp.sum(out[:1, :1]) * 1e-20

    res = interleaved_time(
        [("bf16", bf16_fn, (img, variables)),
         ("bf16+fully_fused", bf16_fused_fn, (img, variables)),
         ("bf16_block_serving", bf16_block_fn, (img, stree)),
         ("int8", int8_fn, (img, qtree))], cycles=7,
        target_s=0.1,
    )
    for name, t in res.items():
        print(f"  {arch} {name}: {t * 1e3:.3f} ms/batch-{B} "
              f"({B / t:.0f} img/s)", flush=True)


def decompose():
    """Per-stage cost of the quantized resnet18 at B=64@224 via prefix
    differentials: time the forward truncated after the stem and after each
    block; stage cost = prefix[k] - prefix[k-1]."""
    import sys
    sys.path.insert(0, ".")
    import jax.nn
    from nwhead_tpu.models import load_model
    from nwhead_tpu.models.quantize import (
        _qconv_apply, quantize_featurizer,
    )

    rng = np.random.default_rng(0)
    B = 64
    img = jnp.asarray(rng.standard_normal((B, 224, 224, 3)).astype(np.float32))
    model = load_model("resnet18")
    variables = model.init(jax.random.PRNGKey(0), img[:1], train=False)
    q = quantize_featurizer(model, variables, img[:32])

    def prefix_fn(n_blocks):
        def fn(xx, carry):
            x_dep = jax.lax.optimization_barrier(
                xx + carry.astype(xx.dtype) * 1e-30
            )
            x = jax.lax.conv_general_dilated(
                x_dep.astype(jnp.bfloat16), q.stem_w, (2, 2),
                q.stem_padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            x = jax.lax.reduce_window(
                x, jnp.bfloat16(-jnp.inf), jax.lax.max, (1, 3, 3, 1),
                (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)),
            )
            x = jax.nn.relu(x + q.stem_b.astype(jnp.bfloat16))
            for blk in q.blocks[:n_blocks]:
                identity = x
                out = jax.nn.relu(_qconv_apply(x, blk.convs[0]))
                out = _qconv_apply(out, blk.convs[1])
                if blk.downsample is not None:
                    identity = _qconv_apply(x, blk.downsample)
                x = jax.nn.relu(out + identity)
            x = jax.lax.optimization_barrier(x)
            return jnp.sum(x[:1, :1, :1].astype(jnp.float32)) * 1e-20

        return fn

    makers = [(f"prefix{k}", prefix_fn(k), (img,))
              for k in range(len(q.blocks) + 1)]
    res = interleaved_time(makers, cycles=5)
    prev = 0.0
    names = ["stem+pool"] + [f"block{k}" for k in range(len(q.blocks))]
    for k, name in enumerate(names):
        t = res[f"prefix{k}"]
        print(f"  {name}: +{(t - prev) * 1e6:7.1f} us (cum {t * 1e6:7.1f})",
              flush=True)
        prev = t


if __name__ == "__main__":
    import sys
    if "--stack" in sys.argv:
        stack()
    elif "--vit" in sys.argv:
        arch = next((a.split("=", 1)[1] for a in sys.argv
                     if a.startswith("--arch=")), "vit_s14")
        bsz = int(next((a.split("=", 1)[1] for a in sys.argv
                        if a.startswith("--batch=")), "64"))
        vit_stack(arch, bsz)
    elif "--stem" in sys.argv:
        stem()
    elif "--decompose" in sys.argv:
        decompose()
    else:
        main()
