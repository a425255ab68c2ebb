"""Headless ResNet / ResNeXt family (Flax linen, NHWC).

TPU-native re-design of the reference model zoo (``model/resnet.py`` in
alanqrwang/nwhead): ImageNet-style ResNets whose ``__call__`` returns pooled
feature vectors, not logits (reference ``resnet.py:194-207``), plus the
CIFAR-scale pre-activation variant (``resnet.py:209-239``).

Conventions matched to the reference:
  * Kaiming-normal fan-out conv init, BN gamma=1/beta=0 (``resnet.py:157-162``).
  * Optional ``zero_init_residual`` zeroing the last BN of each residual
    branch (``resnet.py:167-172``).
  * Explicit torch-style paddings (pad=3 for the 7x7 stem, pad=1 for 3x3)
    rather than XLA 'SAME', so imported torchvision weights reproduce the
    reference bit-for-bit at fp32.

TPU-first choices: NHWC layout (XLA's preferred conv layout), BatchNorm with
``use_running_average`` threaded functionally, grouped convs via
``feature_group_count`` for ResNeXt.
"""

from __future__ import annotations

from typing import Any, Sequence, Type

import flax.linen as nn
import jax.numpy as jnp

ModuleDef = Any

# Kaiming-normal, fan_out, relu gain — torch's nn.init.kaiming_normal_(
# mode='fan_out', nonlinearity='relu').
kaiming_normal_out = nn.initializers.variance_scaling(
    2.0, mode="fan_out", distribution="normal"
)


def conv3x3(features: int, stride: int = 1, groups: int = 1, name: str | None = None, dtype=None):
    return nn.Conv(
        features,
        (3, 3),
        strides=(stride, stride),
        padding=[(1, 1), (1, 1)],
        feature_group_count=groups,
        use_bias=False,
        kernel_init=kaiming_normal_out,
        dtype=dtype,
        name=name,
    )


def conv1x1(features: int, stride: int = 1, name: str | None = None, dtype=None):
    return nn.Conv(
        features,
        (1, 1),
        strides=(stride, stride),
        padding="VALID",
        use_bias=False,
        kernel_init=kaiming_normal_out,
        dtype=dtype,
        name=name,
    )


def _bn(train: bool, zero_init: bool = False, name: str | None = None, dtype=None,
        axis_name=None):
    """BatchNorm with torch semantics (momentum 0.1 -> flax momentum 0.9).
    ``dtype`` is the compute dtype (bf16 for mixed precision); params and
    running statistics stay float32 (flax param_dtype default).
    ``axis_name`` enables cross-device (sync) batch statistics for
    data-parallel training — per-replica stats otherwise (torch DDP's
    default behavior)."""
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        scale_init=nn.initializers.zeros if zero_init else nn.initializers.ones,
        dtype=dtype,
        axis_name=axis_name,
        name=name,
    )


class BasicBlock(nn.Module):
    """Post-activation basic block (``resnet.py:31-66``)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    zero_init_residual: bool = False
    expansion: int = 1
    dtype: Any = None
    bn_axis_name: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        assert self.groups == 1 and self.base_width == 64, (
            "BasicBlock only supports groups=1 and base_width=64"
        )
        dt = self.dtype
        identity = x
        out = conv3x3(self.planes, self.stride, name="conv1", dtype=dt)(x)
        out = _bn(train, name="bn1", dtype=dt, axis_name=self.bn_axis_name)(out)
        out = nn.relu(out)
        out = conv3x3(self.planes, name="conv2", dtype=dt)(out)
        out = _bn(train, zero_init=self.zero_init_residual, name="bn2", dtype=dt, axis_name=self.bn_axis_name)(out)
        if self.downsample:
            identity = conv1x1(self.planes * self.expansion, self.stride, name="ds_conv", dtype=dt)(x)
            identity = _bn(train, name="ds_bn", dtype=dt, axis_name=self.bn_axis_name)(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """Post-activation bottleneck block (``resnet.py:69-109``)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    zero_init_residual: bool = False
    expansion: int = 4
    dtype: Any = None
    bn_axis_name: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        identity = x
        out = conv1x1(width, name="conv1", dtype=dt)(x)
        out = _bn(train, name="bn1", dtype=dt, axis_name=self.bn_axis_name)(out)
        out = nn.relu(out)
        out = conv3x3(width, self.stride, self.groups, name="conv2", dtype=dt)(out)
        out = _bn(train, name="bn2", dtype=dt, axis_name=self.bn_axis_name)(out)
        out = nn.relu(out)
        out = conv1x1(self.planes * self.expansion, name="conv3", dtype=dt)(out)
        out = _bn(train, zero_init=self.zero_init_residual, name="bn3", dtype=dt, axis_name=self.bn_axis_name)(out)
        if self.downsample:
            identity = conv1x1(self.planes * self.expansion, self.stride, name="ds_conv", dtype=dt)(x)
            identity = _bn(train, name="ds_bn", dtype=dt, axis_name=self.bn_axis_name)(identity)
        return nn.relu(out + identity)


class PreActBlock(nn.Module):
    """Pre-activation basic block for CIFAR ResNets (``resnet.py:111-134``)."""

    planes: int
    stride: int = 1
    downsample: bool = False  # shortcut conv when shape changes
    groups: int = 1
    base_width: int = 64
    zero_init_residual: bool = False
    expansion: int = 1
    dtype: Any = None
    bn_axis_name: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        out = nn.relu(_bn(train, name="bn1", dtype=dt, axis_name=self.bn_axis_name)(x))
        if self.downsample:
            shortcut = nn.Conv(
                self.planes * self.expansion,
                (1, 1),
                strides=(self.stride, self.stride),
                padding="VALID",
                use_bias=False,
                kernel_init=kaiming_normal_out,
                dtype=dt,
                name="shortcut",
            )(out)
        else:
            shortcut = x
        out = conv3x3(self.planes, self.stride, name="conv1", dtype=dt)(out)
        out = conv3x3(self.planes, name="conv2", dtype=dt)(nn.relu(_bn(train, name="bn2", dtype=dt, axis_name=self.bn_axis_name)(out)))
        return out + shortcut


class ResNet(nn.Module):
    """ImageNet-style headless ResNet: features end at global-avg-pool
    (``resnet.py:194-207``). Returns ``(B, 512 * expansion)``."""

    block: Type[nn.Module]
    layers: Sequence[int]
    groups: int = 1
    width_per_group: int = 64
    zero_init_residual: bool = False
    dtype: Any = None  # compute dtype; bf16 for mixed precision (params f32)
    bn_axis_name: Any = None  # sync-BN axis for data-parallel training
    # Optional local torchvision checkpoint; merged into the variable tree at
    # init time (NWNet.init / trainers) — the reference's pretrained=True
    # path (``model/resnet.py:259-267``) without network egress.
    pretrained_path: Any = None
    # 'conv7' (torch-identical 7x7/s2 stem) or 's2d': MLPerf-style
    # space-to-depth stem — inputs reshaped (H,W,3)->(H/2,W/2,12) and the
    # stem becomes a 4x4/s1 conv. An EXACT reparameterization of conv7
    # (see s2d_stem_kernel); 12 input channels instead of 3 keep the MXU
    # K-dimension busy, the known TPU ResNet stem optimization.
    stem: str = "conv7"

    @property
    def feat_dim(self) -> int:
        return 512 * self.block.expansion

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        if self.stem == "s2d":
            B, H, W, C = x.shape
            assert H % 2 == 0 and W % 2 == 0, "s2d stem needs even H, W"
            # (H, W, C) -> (H/2, W/2, 4C), channel index (dy, dx, c).
            x = x.reshape(B, H // 2, 2, W // 2, 2, C)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
            x = nn.Conv(
                64,
                (4, 4),
                strides=(1, 1),
                padding=[(2, 1), (2, 1)],
                use_bias=False,
                kernel_init=kaiming_normal_out,
                dtype=self.dtype,
                name="conv1",
            )(x)
        else:
            x = nn.Conv(
                64,
                (7, 7),
                strides=(2, 2),
                padding=[(3, 3), (3, 3)],
                use_bias=False,
                kernel_init=kaiming_normal_out,
                dtype=self.dtype,
                name="conv1",
            )(x)
        x = _bn(train, name="bn1", dtype=self.dtype, axis_name=self.bn_axis_name)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        inplanes = 64
        for stage, (planes, blocks) in enumerate(
            zip((64, 128, 256, 512), self.layers)
        ):
            stride = 1 if stage == 0 else 2
            for i in range(blocks):
                s = stride if i == 0 else 1
                needs_ds = s != 1 or inplanes != planes * self.block.expansion
                x = self.block(
                    planes=planes,
                    stride=s,
                    downsample=needs_ds,
                    groups=self.groups,
                    base_width=self.width_per_group,
                    zero_init_residual=self.zero_init_residual,
                    dtype=self.dtype,
                    bn_axis_name=self.bn_axis_name,
                    name=f"layer{stage + 1}_{i}",
                )(x, train=train)
                inplanes = planes * self.block.expansion

        # Pool in f32 regardless of compute dtype (cheap, avoids bf16 loss).
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        return x


class CIFAR_ResNet(nn.Module):
    """CIFAR-scale pre-activation ResNet (``resnet.py:209-239``): 3x3 stem,
    PreAct blocks, 4x4 average pool. Returns ``(B, 512)`` for 32x32 input."""

    block: Type[nn.Module]
    num_blocks: Sequence[int]
    dtype: Any = None
    bn_axis_name: Any = None
    pretrained_path: Any = None  # (no torchvision CIFAR checkpoints exist,
    # but the field keeps the zoo interface uniform)

    @property
    def feat_dim(self) -> int:
        return 512 * self.block.expansion

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = conv3x3(64, name="conv1", dtype=self.dtype)(x)
        x = _bn(train, name="bn1", dtype=self.dtype, axis_name=self.bn_axis_name)(x)
        x = nn.relu(x)

        in_planes = 64
        for stage, (planes, blocks) in enumerate(
            zip((64, 128, 256, 512), self.num_blocks)
        ):
            stride = 1 if stage == 0 else 2
            for i in range(blocks):
                s = stride if i == 0 else 1
                needs_ds = s != 1 or in_planes != planes * self.block.expansion
                x = self.block(
                    planes=planes,
                    stride=s,
                    downsample=needs_ds,
                    dtype=self.dtype,
                    bn_axis_name=self.bn_axis_name,
                    name=f"layer{stage + 1}_{i}",
                )(x, train=train)
                in_planes = planes * self.block.expansion

        x = nn.avg_pool(x.astype(jnp.float32), (4, 4), strides=(4, 4))
        return x.reshape(x.shape[0], -1)


def s2d_stem_kernel(w7):
    """Transform a (7, 7, C, O) stride-2 stem kernel into the equivalent
    (4, 4, 4C, O) kernel for the space-to-depth stem.

    Derivation: conv7/s2/pad3 computes
        out[i, j, o] = sum_{u,v,c} W[u, v, c, o] * x[2i+u-3, 2j+v-3, c].
    With x2[p, q, (dy, dx, c)] = x[2p+dy, 2q+dx, c] and u = 2a+dy+3
    (a in [-2, 1], dy in {0, 1}),
        out[i, j, o] = sum_{a,b,dy,dx,c} W'[a+2, b+2, (dy,dx,c), o]
                       * x2[i+a, j+b, (dy,dx,c)]
    i.e. a 4x4 stride-1 conv with padding (2, 1); entries with
    2a+dy+3 outside [0, 6] are zero (only a=-2, dy=0).
    """
    import numpy as _np

    w7 = _np.asarray(w7)
    C, O = w7.shape[2], w7.shape[3]
    w4 = _np.zeros((4, 4, 4 * C, O), w7.dtype)
    for a in range(-2, 2):
        for dy in range(2):
            u = 2 * a + dy + 3
            if not (0 <= u <= 6):
                continue
            for b in range(-2, 2):
                for dx in range(2):
                    v = 2 * b + dx + 3
                    if not (0 <= v <= 6):
                        continue
                    # channel index (dy, dx, c) = (dy*2 + dx)*C + c
                    ch = (dy * 2 + dx) * C
                    w4[a + 2, b + 2, ch:ch + C, :] = w7[u, v, :, :]
    return w4


# ---------------------------------------------------------------------------
# Constructors (mirroring the reference registry names, resnet.py:242-324)
# ---------------------------------------------------------------------------

def resnet10(**kw) -> ResNet:
    return ResNet(block=BasicBlock, layers=(1, 1, 1, 1), **kw)


def resnet18(**kw) -> ResNet:
    return ResNet(block=BasicBlock, layers=(2, 2, 2, 2), **kw)


def resnet34(**kw) -> ResNet:
    return ResNet(block=BasicBlock, layers=(3, 4, 6, 3), **kw)


def resnet50(**kw) -> ResNet:
    return ResNet(block=Bottleneck, layers=(3, 4, 6, 3), **kw)


def resnet101(**kw) -> ResNet:
    return ResNet(block=Bottleneck, layers=(3, 4, 23, 3), **kw)


def resnet152(**kw) -> ResNet:
    return ResNet(block=Bottleneck, layers=(3, 8, 36, 3), **kw)


def resnext50_32x4d(**kw) -> ResNet:
    return ResNet(block=Bottleneck, layers=(3, 4, 6, 3), groups=32, width_per_group=4, **kw)


def resnext101_32x8d(**kw) -> ResNet:
    return ResNet(block=Bottleneck, layers=(3, 4, 23, 3), groups=32, width_per_group=8, **kw)


def CIFAR_ResNet10(**kw) -> CIFAR_ResNet:
    return CIFAR_ResNet(block=PreActBlock, num_blocks=(1, 1, 1, 1), **kw)


def CIFAR_ResNet18(**kw) -> CIFAR_ResNet:
    return CIFAR_ResNet(block=PreActBlock, num_blocks=(2, 2, 2, 2), **kw)


def CIFAR_ResNet34(**kw) -> CIFAR_ResNet:
    return CIFAR_ResNet(block=PreActBlock, num_blocks=(3, 4, 6, 3), **kw)
