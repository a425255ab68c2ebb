"""Post-training int8 quantization of ResNet featurizers for serving.

The serving headline is featurizer-bound (ResNet-18 bf16 B=64 ~2.6 ms vs
~19 us fused head). v5e's MXU runs int8 at 2x bf16 peak and XLA lowers
s8 x s8 -> s32 convolutions to it (measured ~2x on the 3x3 stage shapes,
scripts/quant_lab.py); fusing the requantize chain into the conv epilogue
also writes activations at 1/4 the f32 bytes. The reference has no
quantization story at all (pure f32 torch, ``model/resnet.py``); this is a
TPU-serving feature of this framework.

Scheme (standard PTQ, serving-only — training stays f32/bf16):
  * BatchNorm folded into the preceding conv (per-output-channel scale +
    bias) — the serving graph has no BN ops;
  * weights: symmetric per-output-channel int8;
  * activations: symmetric per-tensor int8, scales calibrated from a
    representative batch (max |x| over the calibration set);
  * the stem conv stays bf16 (3 input channels starve the MXU K dim; int8
    measured no faster there) as does the final global-avg-pool (f32).

Typical accuracy cost for ResNet-scale PTQ is well under a point of top-1;
``NWNet.quantize_featurizer`` + tests validate feature agreement and
downstream NW-prediction parity on this stack.
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nwhead_tpu.models.densenet import DenseNet
from nwhead_tpu.models.resnet import BasicBlock, Bottleneck, ResNet


class QConv(NamedTuple):
    """One BN-folded, weight-quantized conv + its input activation scale."""

    wq: jnp.ndarray        # (kh, kw, cin_per_group, cout) int8
    w_scale: jnp.ndarray   # (cout,) f32 — per-out-channel weight scale
    bias: jnp.ndarray      # (cout,) f32 — BN-folded bias
    act_scale: jnp.ndarray  # () f32 — input-tensor quantization scale
    stride: int
    padding: Any           # explicit ((ph, ph), (pw, pw)) or 'VALID'
    groups: int = 1


class QBlock(NamedTuple):
    kind: str              # 'basic' | 'bottleneck'
    convs: Tuple[QConv, ...]        # conv1, conv2[, conv3]
    downsample: Optional[QConv]


class QuantizedResNet(NamedTuple):
    """Serving-only quantized featurizer. ``apply(x)`` mirrors
    ``ResNet.__call__(train=False)`` and returns pooled f32 features."""

    stem_w: jnp.ndarray    # bf16 folded stem kernel
    stem_b: jnp.ndarray    # f32 folded stem bias
    stem_stride: int
    stem_padding: Any
    blocks: Tuple[QBlock, ...]

    def split(self):
        """(statics, array_tree) for ``_qresnet_forward`` — statics
        hashable (jit static arg), arrays a plain pytree (jit traced arg);
        the 413 lesson, same shape as ``QuantizedViT.split``."""
        blk_geo, blk_arr = [], []
        for blk in self.blocks:
            pairs = [_qconv_split(c) for c in blk.convs]
            ds_geo = ds_arr = None
            if blk.downsample is not None:
                ds_geo, ds_arr = _qconv_split(blk.downsample)
            blk_geo.append((blk.kind, tuple(g for g, _ in pairs), ds_geo))
            blk_arr.append((tuple(a for _, a in pairs), ds_arr))
        statics = (
            int(self.stem_stride), _hashable_padding(self.stem_padding),
            tuple(blk_geo),
        )
        return statics, (self.stem_w, self.stem_b, tuple(blk_arr))

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        statics, tree = self.split()
        return _qresnet_forward_jit(statics, tree, x)

    @staticmethod
    def unjitted_forward():
        """The raw forward for callers composing a LARGER jit: call as
        ``fwd(statics, tree, x)`` with the tree as an argument of the
        outer jit, never a closure."""
        return _qresnet_forward


def _fold_conv_bn(conv_p, bn_p, bn_s, eps: float = 1e-5):
    """Fold BN(scale, bias; mean, var) into the preceding bias-free conv:
    w'[..., c] = w[..., c] * gamma_c / sqrt(var_c + eps);
    b'_c = beta_c - gamma_c * mean_c / sqrt(var_c + eps)."""
    w = np.asarray(conv_p["kernel"], np.float32)
    gamma = np.asarray(bn_p["scale"], np.float32)
    beta = np.asarray(bn_p["bias"], np.float32)
    mean = np.asarray(bn_s["mean"], np.float32)
    var = np.asarray(bn_s["var"], np.float32)
    inv_std = 1.0 / np.sqrt(var + eps)
    return w * (gamma * inv_std), beta - gamma * mean * inv_std


def _quantize_weight(w: np.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8."""
    amax = np.max(np.abs(w.reshape(-1, w.shape[-1])), axis=0)
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    wq = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return jnp.asarray(wq), jnp.asarray(scale)


def _hashable_padding(p):
    """Conv padding as a hashable jit-static value ('SAME'/'VALID' strings
    pass through; pair lists become tuples of int pairs)."""
    if isinstance(p, str):
        return p
    return tuple((int(a), int(b)) for a, b in p)


def _qconv_split(qc: QConv):
    """(geometry, arrays) for passing a QConv through jit: geometry is
    hashable (static arg — incl. the calibrated act_scale as a Python
    float, which the requantize chain bakes in), arrays are traced."""
    geo = (
        float(qc.act_scale), int(qc.stride), _hashable_padding(qc.padding),
        int(qc.groups),
    )
    return geo, (qc.wq, qc.w_scale, qc.bias)


def _qconv_apply_split(x: jnp.ndarray, arr, geo) -> jnp.ndarray:
    """Quantize input -> int8 conv (MXU) -> dequantize + bias. The scale/
    bias math is f32 but the tensor is carried in bf16 between convs —
    activations move at half the f32 bytes and the epilogue fuses into the
    conv; the next conv's requantize step re-rounds from bf16 (the int8
    rounding error dominates the bf16 carry error)."""
    act_scale, stride, padding, groups = geo
    wq, w_scale, bias = arr
    # f32 reciprocal, matching the pre-split on-device semantics exactly
    # (a Python-double 1/s differs by up to 1 ulp, which can flip round()
    # at .5 boundaries and drift the int8 codes).
    inv = float(np.float32(1.0) / np.float32(act_scale))
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) * inv), -127, 127).astype(
        jnp.int8
    )
    y = jax.lax.conv_general_dilated(
        x8, wq, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (act_scale * w_scale) + bias
    return y.astype(jnp.bfloat16)


def _qconv_apply(x: jnp.ndarray, qc: QConv) -> jnp.ndarray:
    geo, arr = _qconv_split(qc)
    return _qconv_apply_split(x, arr, geo)


def _qresnet_forward(statics, tree, x: jnp.ndarray) -> jnp.ndarray:
    """Pure quantized-ResNet forward. Weights ride in ``tree`` (a pytree
    of arrays, a jit ARGUMENT) — closing over them would inline the folded
    int8/f32 tree as HLO constants, which the axon remote compile service
    rejects past ~resnet152 scale (HTTP 413). ``statics`` carries the
    hashable geometry (strides/paddings/groups/kinds + calibrated
    activation scales as Python floats)."""
    stem_stride, stem_padding, blk_geo = statics
    stem_w, stem_b, blk_arr = tree
    # Stem: conv -> maxpool -> bias+relu, in that ORDER. The per-channel
    # bias and the (monotone) relu both commute with the window max, so
    # this equals relu(conv + b) -> maxpool exactly — but the elementwise
    # pass runs on the 4x-smaller POOLED tensor. XLA does not fuse the
    # bias/relu into the conv's output write, and on the (B, 112, 112, 64)
    # stem output that unfused pass costs more HBM traffic than the conv
    # itself (measured, quant_lab --decompose).
    x = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), stem_w,
        (stem_stride, stem_stride), stem_padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = jax.lax.reduce_window(
        x, jnp.bfloat16(-jnp.inf), jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    x = jax.nn.relu(x + stem_b.astype(jnp.bfloat16))

    for (kind, conv_geo, ds_geo), (conv_arr, ds_arr) in zip(blk_geo, blk_arr):
        identity = x
        if kind == "basic":
            out = jax.nn.relu(_qconv_apply_split(x, conv_arr[0], conv_geo[0]))
            out = _qconv_apply_split(out, conv_arr[1], conv_geo[1])
        else:
            out = jax.nn.relu(_qconv_apply_split(x, conv_arr[0], conv_geo[0]))
            out = jax.nn.relu(_qconv_apply_split(out, conv_arr[1], conv_geo[1]))
            out = _qconv_apply_split(out, conv_arr[2], conv_geo[2])
        if ds_geo is not None:
            identity = _qconv_apply_split(x, ds_arr, ds_geo)
        x = jax.nn.relu(out + identity)

    return jnp.mean(x.astype(jnp.float32), axis=(1, 2))


_qresnet_forward_jit = jax.jit(_qresnet_forward, static_argnums=(0,))


# ---------------------------------------------------------------------------
# Builder: fold + calibrate + quantize
# ---------------------------------------------------------------------------


def _folded_layers(model: ResNet, variables) -> Tuple[Dict, List[Dict]]:
    """Walk the ResNet param tree; return the folded stem and a per-block
    list of folded (w, b, stride, padding, groups) conv descriptors in
    forward order."""
    params = variables["params"]
    stats = variables["batch_stats"]
    if model.stem != "conv7":
        raise NotImplementedError(
            "quantize_featurizer supports the conv7 stem (the s2d stem is an "
            "experiment flag; quantize the conv7 form instead)"
        )
    stem_w, stem_b = _fold_conv_bn(params["conv1"], params["bn1"], stats["bn1"])
    stem = {"w": stem_w, "b": stem_b, "stride": 2, "padding": ((3, 3), (3, 3))}

    is_bottleneck = model.block is Bottleneck
    if not (is_bottleneck or model.block is BasicBlock):
        raise NotImplementedError(
            f"quantize_featurizer supports BasicBlock/Bottleneck ResNets, "
            f"got {model.block.__name__}"
        )
    blocks = []
    inplanes = 64
    expansion = model.block.expansion
    for stage, (planes, n_blocks) in enumerate(
        zip((64, 128, 256, 512), model.layers)
    ):
        stride = 1 if stage == 0 else 2
        for i in range(n_blocks):
            name = f"layer{stage + 1}_{i}"
            bp, bs = params[name], stats[name]
            s = stride if i == 0 else 1
            needs_ds = s != 1 or inplanes != planes * expansion
            convs = []
            if is_bottleneck:
                w, b = _fold_conv_bn(bp["conv1"], bp["bn1"], bs["bn1"])
                convs.append(dict(w=w, b=b, stride=1, padding="VALID", groups=1))
                w, b = _fold_conv_bn(bp["conv2"], bp["bn2"], bs["bn2"])
                convs.append(dict(w=w, b=b, stride=s, padding=((1, 1), (1, 1)),
                                  groups=model.groups))
                w, b = _fold_conv_bn(bp["conv3"], bp["bn3"], bs["bn3"])
                convs.append(dict(w=w, b=b, stride=1, padding="VALID", groups=1))
            else:
                w, b = _fold_conv_bn(bp["conv1"], bp["bn1"], bs["bn1"])
                convs.append(dict(w=w, b=b, stride=s, padding=((1, 1), (1, 1)),
                                  groups=1))
                w, b = _fold_conv_bn(bp["conv2"], bp["bn2"], bs["bn2"])
                convs.append(dict(w=w, b=b, stride=1, padding=((1, 1), (1, 1)),
                                  groups=1))
            ds = None
            if needs_ds:
                w, b = _fold_conv_bn(bp["ds_conv"], bp["ds_bn"], bs["ds_bn"])
                ds = dict(w=w, b=b, stride=s, padding="VALID", groups=1)
            blocks.append({
                "kind": "bottleneck" if is_bottleneck else "basic",
                "convs": convs,
                "ds": ds,
            })
            inplanes = planes * expansion
    return stem, blocks


def _conv_f32(x, w, b, stride, padding, groups=1):
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(w), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    return y + jnp.asarray(b)


def folded_forward(model: ResNet, variables, x: jnp.ndarray) -> jnp.ndarray:
    """f32 forward through the BN-folded serving graph — must equal the
    flax eval forward exactly (fold-correctness oracle), and is the
    calibration reference."""
    stem, blocks = _folded_layers(model, variables)
    feats, _ = _folded_run(stem, blocks, x, record=False)
    return feats


def _folded_arrays(stem, blocks):
    """The (w, b) pytree of a folded graph, mirroring its structure — for
    passing the weights as jit ARGUMENTS (closing over them inlines the
    folded f32 tree as HLO constants, which the axon remote compile
    service rejects past ~resnet50/ViT-S scale — HTTP 413)."""
    return {
        "stem": {"w": stem["w"], "b": stem["b"]},
        "blocks": [
            {
                "convs": [{"w": c["w"], "b": c["b"]} for c in blk["convs"]],
                "ds": (
                    {"w": blk["ds"]["w"], "b": blk["ds"]["b"]}
                    if blk["ds"] is not None else None
                ),
            }
            for blk in blocks
        ],
    }


def _folded_run(stem, blocks, x, record: bool, arrays=None):
    """Shared folded-f32 executor; optionally records each quantized conv's
    input amax (calibration). When ``arrays`` (a ``_folded_arrays`` tree,
    possibly of tracers) is given, weights come from it and stem/blocks
    contribute only the static geometry."""
    amaxes: List[jnp.ndarray] = []
    if arrays is None:
        arrays = _folded_arrays(stem, blocks)

    def note(t):
        if record:
            amaxes.append(jnp.max(jnp.abs(t)))

    def conv(t, desc, arr):
        return _conv_f32(t, arr["w"], arr["b"], desc["stride"],
                         desc["padding"], desc.get("groups", 1))

    x = jax.nn.relu(conv(x, stem, arrays["stem"]))
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    for blk, a_blk in zip(blocks, arrays["blocks"]):
        identity = x
        outs = x
        note(outs)
        c = blk["convs"]
        ac = a_blk["convs"]
        if blk["kind"] == "basic":
            outs = jax.nn.relu(conv(outs, c[0], ac[0]))
            note(outs)
            outs = conv(outs, c[1], ac[1])
        else:
            outs = jax.nn.relu(conv(outs, c[0], ac[0]))
            note(outs)
            outs = jax.nn.relu(conv(outs, c[1], ac[1]))
            note(outs)
            outs = conv(outs, c[2], ac[2])
        if blk["ds"] is not None:
            identity = conv(x, blk["ds"], a_blk["ds"])
        x = jax.nn.relu(outs + identity)
    return jnp.mean(x, axis=(1, 2)), amaxes


def quantize_featurizer(
    model,
    variables,
    calib_images: jnp.ndarray,
    calib_batch: int = 64,
):
    """Build the int8 serving featurizer from trained variables.

    Dispatches on the backbone family: ResNet/ResNeXt (BN-folded) or
    DenseNet-BC (BN kept as affine). calib_images: a representative image
    batch (post-transform, NHWC) used to calibrate per-tensor activation
    scales (max |x| over the set).
    """
    from nwhead_tpu.models.vit import VisionTransformer

    if isinstance(model, DenseNet):
        return quantize_densenet(model, variables, calib_images, calib_batch)
    if isinstance(model, VisionTransformer):
        return quantize_vit(model, variables, calib_images, calib_batch)
    if not isinstance(model, ResNet):
        raise NotImplementedError(
            f"quantize_featurizer supports the ImageNet ResNet/ResNeXt, "
            f"DenseNet-BC, and ViT families; got {type(model).__name__} "
            f"(the CIFAR variants are not supported)"
        )
    stem, blocks = _folded_layers(model, variables)

    # Calibration: folded-f32 forward capturing per-conv input amaxes.
    # Weights ride as a jit ARGUMENT tree (see _folded_arrays).
    arrays = _folded_arrays(stem, blocks)
    run = jax.jit(
        lambda arrs, xs: _folded_run(stem, blocks, xs, record=True,
                                     arrays=arrs)[1]
    )
    total: Optional[List[np.ndarray]] = None
    n = calib_images.shape[0]
    for start in range(0, n, calib_batch):
        chunk = calib_images[start:start + calib_batch]
        amaxes = [np.asarray(a) for a in run(arrays, jnp.asarray(chunk))]
        total = amaxes if total is None else [
            np.maximum(a, b) for a, b in zip(total, amaxes)
        ]
    it = iter(total)

    def qconv(desc) -> QConv:
        wq, w_scale = _quantize_weight(np.asarray(desc["w"], np.float32))
        amax = float(next(it))
        act_scale = amax / 127.0 if amax > 0 else 1.0
        return QConv(
            wq=wq, w_scale=w_scale, bias=jnp.asarray(desc["b"], jnp.float32),
            act_scale=jnp.float32(act_scale), stride=desc["stride"],
            padding=desc["padding"], groups=desc["groups"],
        )

    qblocks = []
    for blk in blocks:
        # note() order in _folded_run: block input, then post-relu
        # intermediates — conv1 input first, then conv2 [, conv3].
        convs = tuple(qconv(c) for c in blk["convs"])
        ds = None
        if blk["ds"] is not None:
            # Downsample consumes the block INPUT: reuse conv1's act_scale.
            wq, w_scale = _quantize_weight(
                np.asarray(blk["ds"]["w"], np.float32)
            )
            ds = QConv(
                wq=wq, w_scale=w_scale,
                bias=jnp.asarray(blk["ds"]["b"], jnp.float32),
                act_scale=convs[0].act_scale,
                stride=blk["ds"]["stride"], padding=blk["ds"]["padding"],
                groups=blk["ds"]["groups"],
            )
        qblocks.append(QBlock(kind=blk["kind"], convs=convs, downsample=ds))

    return QuantizedResNet(
        stem_w=jnp.asarray(stem["w"], jnp.bfloat16),
        stem_b=jnp.asarray(stem["b"], jnp.float32),
        stem_stride=stem["stride"],
        stem_padding=stem["padding"],
        blocks=tuple(qblocks),
    )


# ---------------------------------------------------------------------------
# DenseNet: pre-activation BN-ReLU-Conv — BN cannot fold across the ReLU, so
# it stays as a precomputed per-channel affine (two fused VPU ops); every
# conv still runs int8 on the MXU.
# ---------------------------------------------------------------------------


class QAffine(NamedTuple):
    """BatchNorm at inference, reduced to y = x * scale + shift."""

    scale: jnp.ndarray  # (C,) f32
    shift: jnp.ndarray  # (C,) f32

    def __call__(self, x):
        return (
            x.astype(jnp.float32) * self.scale + self.shift
        ).astype(jnp.bfloat16)


class QDenseLayer(NamedTuple):
    bn1: QAffine
    conv1: QConv  # 1x1 bottleneck
    bn2: QAffine
    conv2: QConv  # 3x3 growth


def _qdensenet_forward(statics, tree, x: jnp.ndarray) -> jnp.ndarray:
    """Pure quantized-DenseNet forward — weights in ``tree`` (jit traced
    arg), conv geometry + activation scales in hashable ``statics`` (the
    413 lesson; see ``_qresnet_forward``)."""
    blocks_geo, trans_geo = statics
    stem_w, bn0, blocks_arr, trans_arr, final_bn = tree
    x = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), stem_w, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = jax.nn.relu(bn0(x))
    x = jax.lax.reduce_window(
        x, jnp.bfloat16(-jnp.inf), jax.lax.max, (1, 3, 3, 1),
        (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    for block_geo, block_arr, tg, ta in zip(
        blocks_geo, blocks_arr, trans_geo, trans_arr
    ):
        for (g1, g2), (bn1, a1, bn2, a2) in zip(block_geo, block_arr):
            h = jax.nn.relu(bn1(x))
            h = _qconv_apply_split(h, a1, g1)
            h = jax.nn.relu(bn2(h))
            h = _qconv_apply_split(h, a2, g2)
            x = jnp.concatenate([x, h], axis=-1)
        if tg is not None:
            t_bn, t_arr = ta
            h = jax.nn.relu(t_bn(x))
            h = _qconv_apply_split(h, t_arr, tg)
            x = jax.lax.reduce_window(
                h, jnp.bfloat16(0.0), jax.lax.add, (1, 2, 2, 1),
                (1, 2, 2, 1), ((0, 0), (0, 0), (0, 0), (0, 0)),
            ) * 0.25
    x = jax.nn.relu(final_bn(x))
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2))


_qdensenet_forward_jit = jax.jit(_qdensenet_forward, static_argnums=(0,))


class QuantizedDenseNet(NamedTuple):
    """Serving-only quantized DenseNet-BC: mirrors
    ``DenseNet.__call__(train=False)`` (``models/densenet.py:149-190``)."""

    stem_w: jnp.ndarray  # bf16 conv0 kernel
    bn0: QAffine
    blocks: Tuple[Tuple[QDenseLayer, ...], ...]
    transitions: Tuple[Optional[Tuple[QAffine, QConv]], ...]  # len = blocks
    final_bn: QAffine

    def split(self):
        """(statics, array_tree) for ``_qdensenet_forward`` (413 lesson,
        same shape as ``QuantizedViT.split``)."""
        blocks_geo, blocks_arr = [], []
        for block in self.blocks:
            lg, la = [], []
            for layer in block:
                g1, a1 = _qconv_split(layer.conv1)
                g2, a2 = _qconv_split(layer.conv2)
                lg.append((g1, g2))
                la.append((layer.bn1, a1, layer.bn2, a2))
            blocks_geo.append(tuple(lg))
            blocks_arr.append(tuple(la))
        trans_geo, trans_arr = [], []
        for trans in self.transitions:
            if trans is None:
                trans_geo.append(None)
                trans_arr.append(None)
            else:
                g, a = _qconv_split(trans[1])
                trans_geo.append(g)
                trans_arr.append((trans[0], a))
        statics = (tuple(blocks_geo), tuple(trans_geo))
        tree = (
            self.stem_w, self.bn0, tuple(blocks_arr), tuple(trans_arr),
            self.final_bn,
        )
        return statics, tree

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        statics, tree = self.split()
        return _qdensenet_forward_jit(statics, tree, x)

    @staticmethod
    def unjitted_forward():
        """Raw forward for callers composing a LARGER jit — tree as an
        argument of the outer jit, never a closure."""
        return _qdensenet_forward


def _bn_affine(bn_p, bn_s, eps: float = 1e-5) -> QAffine:
    gamma = np.asarray(bn_p["scale"], np.float32)
    beta = np.asarray(bn_p["bias"], np.float32)
    mean = np.asarray(bn_s["mean"], np.float32)
    var = np.asarray(bn_s["var"], np.float32)
    inv_std = 1.0 / np.sqrt(var + eps)
    return QAffine(
        scale=jnp.asarray(gamma * inv_std),
        shift=jnp.asarray(beta - gamma * mean * inv_std),
    )


def quantize_densenet(
    model: DenseNet,
    variables,
    calib_images: jnp.ndarray,
    calib_batch: int = 64,
) -> QuantizedDenseNet:
    """int8 PTQ for the ImageNet DenseNet-BC family: convs quantized
    (per-out-channel weights + calibrated per-tensor activation scales),
    BNs kept as precomputed affines (pre-activation layout — no fold across
    the ReLU)."""
    params = variables["params"]
    stats = variables["batch_stats"]

    # Structure walk + an f32 calibration forward that records each
    # quantized conv's input amax (post relu(BN), exactly what serving
    # quantizes). Conv weights and the HOST-precomputed BN affines ride as
    # jit ARGUMENTS (closing over them would inline the f32 weight tree as
    # HLO constants, which the axon remote compile service caps at HTTP
    # 413); precomputing the affines keeps the calibration numerics
    # bit-identical to the serving graph's QAffine path.
    def _aff(p, s):
        a = _bn_affine(p, s)
        return {"scale": a.scale, "shift": a.shift}

    affines = {"norm0": _aff(params["norm0"], stats["norm0"])}
    for i, num_layers in enumerate(model.block_config):
        bp, bs = params[f"denseblock{i + 1}"], stats[f"denseblock{i + 1}"]
        for j in range(num_layers):
            lp, ls = bp[f"denselayer{j + 1}"], bs[f"denselayer{j + 1}"]
            affines[f"b{i}l{j}n1"] = _aff(lp["norm1"], ls["norm1"])
            affines[f"b{i}l{j}n2"] = _aff(lp["norm2"], ls["norm2"])
        if i != len(model.block_config) - 1:
            tp, ts = params[f"transition{i + 1}"], stats[f"transition{i + 1}"]
            affines[f"t{i}"] = _aff(tp["norm"], ts["norm"])

    def run_calib(params, affines, x):
        amaxes = []

        def qin(t):
            amaxes.append(jnp.max(jnp.abs(t)))
            return t

        def conv(t, p, stride=1, padding="VALID"):
            return jax.lax.conv_general_dilated(
                t, p["kernel"].astype(jnp.float32), (stride, stride),
                padding, dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        def bn(t, key):
            a = affines[key]
            return t * a["scale"] + a["shift"]

        t = conv(x, params["conv0"], 2, ((3, 3), (3, 3)))
        t = jax.nn.relu(bn(t, "norm0"))
        t = jax.lax.reduce_window(
            t, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)),
        )
        for i, num_layers in enumerate(model.block_config):
            bp = params[f"denseblock{i + 1}"]
            for j in range(num_layers):
                lp = bp[f"denselayer{j + 1}"]
                h = jax.nn.relu(bn(t, f"b{i}l{j}n1"))
                h = conv(qin(h), lp["conv1"])
                h = jax.nn.relu(bn(h, f"b{i}l{j}n2"))
                h = conv(qin(h), lp["conv2"], 1, ((1, 1), (1, 1)))
                t = jnp.concatenate([t, h], axis=-1)
            if i != len(model.block_config) - 1:
                tname = f"transition{i + 1}"
                tp = params[tname]
                h = jax.nn.relu(bn(t, f"t{i}"))
                h = conv(qin(h), tp["conv"])
                t = jax.lax.reduce_window(
                    h, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                    ((0, 0), (0, 0), (0, 0), (0, 0)),
                ) * 0.25
        return amaxes

    run = jax.jit(run_calib)
    total = None
    for start in range(0, calib_images.shape[0], calib_batch):
        chunk = jnp.asarray(calib_images[start:start + calib_batch])
        amaxes = [np.asarray(a) for a in run(params, affines, chunk)]
        total = amaxes if total is None else [
            np.maximum(a, b) for a, b in zip(total, amaxes)
        ]
    it = iter(total)

    def qconv(p, stride=1, padding="VALID") -> QConv:
        w = np.asarray(p["kernel"], np.float32)
        wq, w_scale = _quantize_weight(w)
        amax = float(next(it))
        return QConv(
            wq=wq, w_scale=w_scale,
            bias=jnp.zeros((w.shape[-1],), jnp.float32),
            act_scale=jnp.float32(amax / 127.0 if amax > 0 else 1.0),
            stride=stride, padding=padding, groups=1,
        )

    blocks, transitions = [], []
    for i, num_layers in enumerate(model.block_config):
        bname = f"denseblock{i + 1}"
        bp, bs = params[bname], stats[bname]
        layers = []
        for j in range(num_layers):
            lp, ls = bp[f"denselayer{j + 1}"], bs[f"denselayer{j + 1}"]
            layers.append(QDenseLayer(
                bn1=_bn_affine(lp["norm1"], ls["norm1"]),
                conv1=qconv(lp["conv1"]),
                bn2=_bn_affine(lp["norm2"], ls["norm2"]),
                conv2=qconv(lp["conv2"], 1, ((1, 1), (1, 1))),
            ))
        blocks.append(tuple(layers))
        if i != len(model.block_config) - 1:
            tname = f"transition{i + 1}"
            tp, ts = params[tname], stats[tname]
            transitions.append(
                (_bn_affine(tp["norm"], ts["norm"]), qconv(tp["conv"]))
            )
        else:
            transitions.append(None)

    return QuantizedDenseNet(
        stem_w=jnp.asarray(params["conv0"]["kernel"], jnp.bfloat16),
        bn0=_bn_affine(params["norm0"], stats["norm0"]),
        blocks=tuple(blocks),
        transitions=tuple(transitions),
        final_bn=_bn_affine(params["norm5"], stats["norm5"]),
    )


# ---------------------------------------------------------------------------
# ViT (DINOv2-style): every Dense (qkv / proj / fc1 / fc2) runs int8 on the
# MXU; LayerNorms and the attention softmax stay f32; the patch-embed conv
# (3 input channels) and the residual stream stay bf16.
# ---------------------------------------------------------------------------


class QDense(NamedTuple):
    """int8 Dense: per-out-channel weight scales + per-tensor input scale."""

    wq: jnp.ndarray        # (din, dout) int8
    w_scale: jnp.ndarray   # (dout,) f32
    bias: jnp.ndarray      # (dout,) f32
    act_scale: jnp.ndarray  # () f32

    def __call__(self, x):
        inv = 1.0 / self.act_scale
        x8 = jnp.clip(
            jnp.round(x.astype(jnp.float32) * inv), -127, 127
        ).astype(jnp.int8)
        y = jax.lax.dot_general(
            x8, self.wq, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * (self.act_scale * self.w_scale) + self.bias
        return y.astype(jnp.bfloat16)


class QLayerNorm(NamedTuple):
    scale: jnp.ndarray
    bias: jnp.ndarray

    def __call__(self, x, eps: float = 1e-6):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + eps) * self.scale + self.bias
        return y.astype(jnp.bfloat16)


class QViTBlock(NamedTuple):
    norm1: QLayerNorm
    qkv: QDense
    proj: QDense
    ls1: Optional[jnp.ndarray]  # (dim,) LayerScale gamma or None
    norm2: QLayerNorm
    fc1: QDense
    fc2: QDense
    ls2: Optional[jnp.ndarray]


def _qvit_forward(statics, tree, x):
    """Pure quantized-ViT forward. Weights ride in ``tree`` (a pytree of
    arrays, a jit ARGUMENT) — closing over them would inline the whole
    weight set as HLO constants, which the axon remote-compile service
    rejects at ViT-B scale (HTTP 413). ``statics`` carries the shapes the
    kernels need at trace time, including the calibrated activation
    scales as Python floats (the fused kernels bake them in)."""
    from nwhead_tpu.models.vit import _interpolate_pos_embed
    from nwhead_tpu.ops.pallas_attn import (
        _int8_attn_k_chunk,
        fused_attention_qkv,
        fused_attention_qkv_int8,
    )
    from nwhead_tpu.ops.pallas_mlp import fused_mlp_int8

    patch_size, num_heads, scales = statics
    patch_w, patch_b, cls_token, pos_embed, blocks, final_norm = tree

    B, H, W, _ = x.shape
    gh, gw = H // patch_size, W // patch_size
    D = patch_w.shape[-1]
    x = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), patch_w,
        (patch_size, patch_size), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + patch_b.astype(jnp.bfloat16)
    x = x.reshape(B, gh * gw, D)

    cls_pos, patch_pos = pos_embed[:, :1], pos_embed[:, 1:]
    patch_pos = _interpolate_pos_embed(patch_pos, gh * gw, gh, gw)
    x = x + patch_pos.astype(x.dtype)
    cls_tok = (cls_token + cls_pos).astype(x.dtype)
    x = jnp.concatenate(
        [jnp.broadcast_to(cls_tok, (B, 1, D)), x], axis=1
    )

    head_dim = D // num_heads
    N = x.shape[1]
    try:
        # Single-pass OR flash-tiled — the int8 kernel chunks the score
        # matrix itself at long N (the qkv tensor is linear in N and
        # VMEM-resident either way).
        _int8_attn_k_chunk(N, D)
        int8_attn_ok = True
    except ValueError:
        int8_attn_ok = False
    for blk, (a_qkv, a_proj, a_fc1, a_fc2) in zip(blocks, scales):
        if int8_attn_ok:
            # Whole attention HALF-BLOCK in one int8 kernel: LayerNorm,
            # qkv and proj on the int8 MXU, requant chains + per-head
            # f32 softmax, LayerScale, residual add — nothing between
            # one residual stream state and the next touches HBM, and
            # no XLA elementwise pass runs between the two kernels.
            x = fused_attention_qkv_int8(
                x, blk.qkv.wq, blk.qkv.w_scale, blk.qkv.bias,
                a_qkv, blk.proj.wq, blk.proj.w_scale,
                blk.proj.bias, a_proj, num_heads,
                ln_scale=blk.norm1.scale, ln_bias=blk.norm1.bias,
                layerscale=blk.ls1, residual=True,
            )
        else:
            # Long-sequence fallback: per-op QDense around the
            # flash-tiled bf16 attention kernel.
            h = blk.qkv(blk.norm1(x))
            h = h.reshape(B, N, 3, num_heads, head_dim)
            out = fused_attention_qkv(h, num_heads)
            out = blk.proj(out)
            if blk.ls1 is not None:
                out = out * blk.ls1.astype(out.dtype)
            x = x + out
        # Fused int8 MLP half-block (LayerNorm + LayerScale + residual
        # folded the same way): both matmuls on the int8 MXU with the
        # requantize chains and the 4D hidden activation entirely in
        # VMEM (the per-op QDense version lost its int8 gains to
        # exactly those HBM round-trips).
        x = fused_mlp_int8(
            x,
            blk.fc1.wq, blk.fc1.w_scale, blk.fc1.bias, a_fc1,
            blk.fc2.wq, blk.fc2.w_scale, blk.fc2.bias, a_fc2,
            ln_scale=blk.norm2.scale, ln_bias=blk.norm2.bias,
            layerscale=blk.ls2, residual=True,
        )

    x = final_norm(x)
    return x[:, 0].astype(jnp.float32)


_qvit_forward_jit = jax.jit(_qvit_forward, static_argnums=(0,))


class QuantizedViT(NamedTuple):
    """Serving-only quantized ViT; mirrors
    ``VisionTransformer.__call__(train=False)`` (``models/vit.py:119-163``)."""

    patch_w: jnp.ndarray   # bf16 (p, p, 3, D)
    patch_b: jnp.ndarray   # f32 (D,)
    cls_token: jnp.ndarray  # (1, 1, D) f32
    pos_embed: jnp.ndarray  # (1, n_pos + 1, D) f32
    patch_size: int
    num_heads: int
    blocks: Tuple[QViTBlock, ...]
    final_norm: QLayerNorm

    def split(self):
        """(statics, array_tree) for ``_qvit_forward`` — statics hashable
        (jit static arg), arrays a plain pytree (jit traced arg)."""
        scales = tuple(
            (float(b.qkv.act_scale), float(b.proj.act_scale),
             float(b.fc1.act_scale), float(b.fc2.act_scale))
            for b in self.blocks
        )
        statics = (self.patch_size, self.num_heads, scales)
        tree = (self.patch_w, self.patch_b, self.cls_token, self.pos_embed,
                self.blocks, self.final_norm)
        return statics, tree

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        statics, tree = self.split()
        return _qvit_forward_jit(statics, tree, x)

    @staticmethod
    def unjitted_forward():
        """The raw forward for callers composing a LARGER jit (e.g.
        ``NWNet.make_serving_fn``): call as ``fwd(statics, tree, x)`` with
        the tree as an argument of the outer jit, never a closure."""
        return _qvit_forward


def quantize_vit(
    model,
    variables,
    calib_images: jnp.ndarray,
    calib_batch: int = 64,
) -> QuantizedViT:
    """int8 PTQ for the ViT zoo: the four Dense matmuls per block quantized
    (per-out-channel weights, calibrated per-tensor activation scales);
    LayerNorm/softmax/GELU f32, attention contractions and the residual
    stream bf16, patch embed bf16 (3-channel input)."""
    params = variables["params"]

    # Calibration: f32 flax-equivalent forward, recording each Dense input's
    # amax — norm1 out (qkv), attention out (proj), norm2 out (fc1), gelu
    # out (fc2), in block order.
    from nwhead_tpu.models.vit import _interpolate_pos_embed

    def run_calib(params, x):
        # params rides as a jit ARGUMENT: closing over it would inline the
        # whole f32 weight tree as HLO constants, which the axon remote
        # compile service rejects at ViT-B scale (HTTP 413 body limit).
        amaxes = []

        def note(t):
            amaxes.append(jnp.max(jnp.abs(t)))
            return t

        def ln(t, p):
            mean = jnp.mean(t, -1, keepdims=True)
            var = jnp.mean(jnp.square(t - mean), -1, keepdims=True)
            return (t - mean) * jax.lax.rsqrt(var + 1e-6) * jnp.asarray(
                p["scale"]
            ) + jnp.asarray(p["bias"])

        def dense(t, p):
            return t @ jnp.asarray(p["kernel"]) + jnp.asarray(p["bias"])

        B, H, W, _ = x.shape
        p = model.patch_size
        gh, gw = H // p, W // p
        D = model.embed_dim
        t = jax.lax.conv_general_dilated(
            x, jnp.asarray(params["patch_embed"]["kernel"]), (p, p), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.asarray(params["patch_embed"]["bias"])
        t = t.reshape(B, gh * gw, D)
        pos = jnp.asarray(params["pos_embed"])
        cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
        patch_pos = _interpolate_pos_embed(patch_pos, gh * gw, gh, gw)
        t = t + patch_pos
        cls_tok = jnp.asarray(params["cls_token"]) + cls_pos
        t = jnp.concatenate([jnp.broadcast_to(cls_tok, (B, 1, D)), t], axis=1)

        head_dim = D // model.num_heads
        for i in range(model.depth):
            bp = params[f"block{i}"]
            h = dense(note(ln(t, bp["norm1"])), bp["attn"]["qkv"])
            N = h.shape[1]
            h = h.reshape(B, N, 3, model.num_heads, head_dim)
            qh, kh, vh = h[:, :, 0], h[:, :, 1], h[:, :, 2]
            attn = jnp.einsum("bnhd,bmhd->bhnm", qh, kh) / np.sqrt(head_dim)
            attn = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, vh).reshape(B, N, D)
            out = dense(note(out), bp["attn"]["proj"])
            if "ls1_gamma" in bp:
                out = out * jnp.asarray(bp["ls1_gamma"])
            t = t + out
            h = dense(note(ln(t, bp["norm2"])), bp["mlp"]["fc1"])
            h = jax.nn.gelu(h, approximate=False)
            h = dense(note(h), bp["mlp"]["fc2"])
            if "ls2_gamma" in bp:
                h = h * jnp.asarray(bp["ls2_gamma"])
            t = t + h
        return amaxes

    run = jax.jit(run_calib)
    total = None
    for start in range(0, calib_images.shape[0], calib_batch):
        chunk = jnp.asarray(calib_images[start:start + calib_batch])
        amaxes = [np.asarray(a) for a in run(params, chunk)]
        total = amaxes if total is None else [
            np.maximum(a, b) for a, b in zip(total, amaxes)
        ]
    it = iter(total)

    def qdense(p) -> QDense:
        w = np.asarray(p["kernel"], np.float32)
        amax_w = np.max(np.abs(w), axis=0)
        w_scale = np.where(amax_w > 0, amax_w / 127.0, 1.0).astype(np.float32)
        wq = np.clip(np.round(w / w_scale), -127, 127).astype(np.int8)
        amax = float(next(it))
        return QDense(
            wq=jnp.asarray(wq), w_scale=jnp.asarray(w_scale),
            bias=jnp.asarray(p["bias"], jnp.float32),
            act_scale=jnp.float32(amax / 127.0 if amax > 0 else 1.0),
        )

    def qln(p) -> QLayerNorm:
        return QLayerNorm(
            scale=jnp.asarray(p["scale"], jnp.float32),
            bias=jnp.asarray(p["bias"], jnp.float32),
        )

    blocks = []
    for i in range(model.depth):
        bp = params[f"block{i}"]
        norm1 = qln(bp["norm1"])
        qkv = qdense(bp["attn"]["qkv"])
        proj = qdense(bp["attn"]["proj"])
        norm2 = qln(bp["norm2"])
        fc1 = qdense(bp["mlp"]["fc1"])
        fc2 = qdense(bp["mlp"]["fc2"])
        blocks.append(QViTBlock(
            norm1=norm1, qkv=qkv, proj=proj,
            ls1=jnp.asarray(bp["ls1_gamma"], jnp.float32)
            if "ls1_gamma" in bp else None,
            norm2=norm2, fc1=fc1, fc2=fc2,
            ls2=jnp.asarray(bp["ls2_gamma"], jnp.float32)
            if "ls2_gamma" in bp else None,
        ))

    return QuantizedViT(
        patch_w=jnp.asarray(params["patch_embed"]["kernel"], jnp.bfloat16),
        patch_b=jnp.asarray(params["patch_embed"]["bias"], jnp.float32),
        cls_token=jnp.asarray(params["cls_token"], jnp.float32),
        pos_embed=jnp.asarray(params["pos_embed"], jnp.float32),
        patch_size=model.patch_size,
        num_heads=model.num_heads,
        blocks=tuple(blocks),
        final_norm=qln(params["norm"]),
    )


# ---------------------------------------------------------------------------
# Serving-artifact serialization: quantize once, save, serve
# ---------------------------------------------------------------------------


def _pad_to_meta(p):
    return p if isinstance(p, str) else [list(x) for x in p]


def _pad_from_meta(p):
    return p if isinstance(p, str) else tuple(tuple(x) for x in p)


def save_quantized(q, path: str) -> None:
    """Serialize a quantized featurizer (ResNet or DenseNet family) to one
    ``.npz`` (arrays + a JSON manifest for the static structure). bf16 stem
    weights are stored as f32 (numpy has no bf16) and cast back on load —
    exact."""
    import json

    arrays: Dict[str, np.ndarray] = {}

    def put(prefix: str, qc: QConv):
        arrays[f"{prefix}.wq"] = np.asarray(qc.wq)
        arrays[f"{prefix}.w_scale"] = np.asarray(qc.w_scale)
        arrays[f"{prefix}.bias"] = np.asarray(qc.bias)
        arrays[f"{prefix}.act_scale"] = np.asarray(qc.act_scale)
        return {
            "stride": qc.stride,
            "padding": _pad_to_meta(qc.padding),
            "groups": qc.groups,
        }

    def put_affine(prefix: str, a: QAffine):
        arrays[f"{prefix}.scale"] = np.asarray(a.scale)
        arrays[f"{prefix}.shift"] = np.asarray(a.shift)

    if isinstance(q, QuantizedResNet):
        arrays["stem_w"] = np.asarray(q.stem_w.astype(jnp.float32))
        arrays["stem_b"] = np.asarray(q.stem_b)
        meta = {
            "family": "resnet",
            "stem_stride": q.stem_stride,
            "stem_padding": _pad_to_meta(q.stem_padding),
            "blocks": [
                {
                    "kind": blk.kind,
                    "convs": [
                        put(f"b{i}.c{j}", c) for j, c in enumerate(blk.convs)
                    ],
                    "ds": put(f"b{i}.ds", blk.downsample)
                    if blk.downsample else None,
                }
                for i, blk in enumerate(q.blocks)
            ],
        }
    elif isinstance(q, QuantizedViT):
        arrays["patch_w"] = np.asarray(q.patch_w.astype(jnp.float32))
        arrays["patch_b"] = np.asarray(q.patch_b)
        arrays["cls_token"] = np.asarray(q.cls_token)
        arrays["pos_embed"] = np.asarray(q.pos_embed)

        def put_dense(prefix: str, d: QDense):
            arrays[f"{prefix}.wq"] = np.asarray(d.wq)
            arrays[f"{prefix}.w_scale"] = np.asarray(d.w_scale)
            arrays[f"{prefix}.bias"] = np.asarray(d.bias)
            arrays[f"{prefix}.act_scale"] = np.asarray(d.act_scale)

        def put_ln(prefix: str, n: QLayerNorm):
            arrays[f"{prefix}.scale"] = np.asarray(n.scale)
            arrays[f"{prefix}.bias"] = np.asarray(n.bias)

        meta = {
            "family": "vit",
            "patch_size": q.patch_size,
            "num_heads": q.num_heads,
            "blocks": [],
        }
        for i, blk in enumerate(q.blocks):
            put_ln(f"b{i}.norm1", blk.norm1)
            put_ln(f"b{i}.norm2", blk.norm2)
            for name in ("qkv", "proj", "fc1", "fc2"):
                put_dense(f"b{i}.{name}", getattr(blk, name))
            bm = {"ls1": blk.ls1 is not None, "ls2": blk.ls2 is not None}
            if blk.ls1 is not None:
                arrays[f"b{i}.ls1"] = np.asarray(blk.ls1)
            if blk.ls2 is not None:
                arrays[f"b{i}.ls2"] = np.asarray(blk.ls2)
            meta["blocks"].append(bm)
        put_ln("final_norm", q.final_norm)
    elif isinstance(q, QuantizedDenseNet):
        arrays["stem_w"] = np.asarray(q.stem_w.astype(jnp.float32))
        put_affine("bn0", q.bn0)
        put_affine("final_bn", q.final_bn)
        meta = {"family": "densenet", "blocks": []}
        for i, (block, trans) in enumerate(zip(q.blocks, q.transitions)):
            layers = []
            for j, layer in enumerate(block):
                put_affine(f"b{i}.l{j}.bn1", layer.bn1)
                put_affine(f"b{i}.l{j}.bn2", layer.bn2)
                layers.append({
                    "conv1": put(f"b{i}.l{j}.c1", layer.conv1),
                    "conv2": put(f"b{i}.l{j}.c2", layer.conv2),
                })
            tm = None
            if trans is not None:
                put_affine(f"t{i}.bn", trans[0])
                tm = put(f"t{i}.conv", trans[1])
            meta["blocks"].append({"layers": layers, "transition": tm})
    else:
        raise NotImplementedError(f"cannot serialize {type(q).__name__}")

    np.savez(path, __meta__=np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    ), **arrays)


def load_quantized(path: str):
    """Load a ``save_quantized`` artifact (either family)."""
    import json

    with np.load(path if str(path).endswith(".npz") else f"{path}.npz") as z:
        meta = json.loads(bytes(z["__meta__"]).decode())

        def get(prefix: str, cm) -> QConv:
            return QConv(
                wq=jnp.asarray(z[f"{prefix}.wq"]),
                w_scale=jnp.asarray(z[f"{prefix}.w_scale"]),
                bias=jnp.asarray(z[f"{prefix}.bias"]),
                act_scale=jnp.asarray(z[f"{prefix}.act_scale"]),
                stride=cm["stride"],
                padding=_pad_from_meta(cm["padding"]),
                groups=cm["groups"],
            )

        def get_affine(prefix: str) -> QAffine:
            return QAffine(
                scale=jnp.asarray(z[f"{prefix}.scale"]),
                shift=jnp.asarray(z[f"{prefix}.shift"]),
            )

        if meta.get("family", "resnet") == "vit":
            def get_dense(prefix: str) -> QDense:
                return QDense(
                    wq=jnp.asarray(z[f"{prefix}.wq"]),
                    w_scale=jnp.asarray(z[f"{prefix}.w_scale"]),
                    bias=jnp.asarray(z[f"{prefix}.bias"]),
                    act_scale=jnp.asarray(z[f"{prefix}.act_scale"]),
                )

            def get_ln(prefix: str) -> QLayerNorm:
                return QLayerNorm(
                    scale=jnp.asarray(z[f"{prefix}.scale"]),
                    bias=jnp.asarray(z[f"{prefix}.bias"]),
                )

            blocks = tuple(
                QViTBlock(
                    norm1=get_ln(f"b{i}.norm1"),
                    qkv=get_dense(f"b{i}.qkv"),
                    proj=get_dense(f"b{i}.proj"),
                    ls1=jnp.asarray(z[f"b{i}.ls1"]) if bm["ls1"] else None,
                    norm2=get_ln(f"b{i}.norm2"),
                    fc1=get_dense(f"b{i}.fc1"),
                    fc2=get_dense(f"b{i}.fc2"),
                    ls2=jnp.asarray(z[f"b{i}.ls2"]) if bm["ls2"] else None,
                )
                for i, bm in enumerate(meta["blocks"])
            )
            return QuantizedViT(
                patch_w=jnp.asarray(z["patch_w"]).astype(jnp.bfloat16),
                patch_b=jnp.asarray(z["patch_b"]),
                cls_token=jnp.asarray(z["cls_token"]),
                pos_embed=jnp.asarray(z["pos_embed"]),
                patch_size=meta["patch_size"],
                num_heads=meta["num_heads"],
                blocks=blocks,
                final_norm=get_ln("final_norm"),
            )

        if meta.get("family", "resnet") == "densenet":
            blocks, transitions = [], []
            for i, bm in enumerate(meta["blocks"]):
                blocks.append(tuple(
                    QDenseLayer(
                        bn1=get_affine(f"b{i}.l{j}.bn1"),
                        conv1=get(f"b{i}.l{j}.c1", lm["conv1"]),
                        bn2=get_affine(f"b{i}.l{j}.bn2"),
                        conv2=get(f"b{i}.l{j}.c2", lm["conv2"]),
                    )
                    for j, lm in enumerate(bm["layers"])
                ))
                transitions.append(
                    (get_affine(f"t{i}.bn"), get(f"t{i}.conv", bm["transition"]))
                    if bm["transition"] else None
                )
            return QuantizedDenseNet(
                stem_w=jnp.asarray(z["stem_w"]).astype(jnp.bfloat16),
                bn0=get_affine("bn0"),
                blocks=tuple(blocks),
                transitions=tuple(transitions),
                final_bn=get_affine("final_bn"),
            )

        blocks = []
        for i, bm in enumerate(meta["blocks"]):
            blocks.append(QBlock(
                kind=bm["kind"],
                convs=tuple(
                    get(f"b{i}.c{j}", cm) for j, cm in enumerate(bm["convs"])
                ),
                downsample=get(f"b{i}.ds", bm["ds"]) if bm["ds"] else None,
            ))
        return QuantizedResNet(
            stem_w=jnp.asarray(z["stem_w"]).astype(jnp.bfloat16),
            stem_b=jnp.asarray(z["stem_b"]),
            stem_stride=meta["stem_stride"],
            stem_padding=_pad_from_meta(meta["stem_padding"]),
            blocks=tuple(blocks),
        )
