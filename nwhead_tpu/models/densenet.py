"""Headless DenseNet-BC family (Flax linen, NHWC).

Equivalents of the reference DenseNets: the ImageNet models
(``model/densenet.py:93-163`` — features -> relu -> global-avg-pool, the
classifier line is commented out at ``densenet.py:145``) and the CIFAR-scale
DenseNet-BC (``model/densenet3.py:37-83``).

``memory_efficient=True`` maps the reference's
``torch.utils.checkpoint`` recompute trick (``densenet.py:51-54``) onto
``jax.checkpoint`` (rematerialization) around each dense layer — the idiomatic
XLA way to trade FLOPs for HBM.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from nwhead_tpu.models.resnet import kaiming_normal_out, _bn


class DenseLayer(nn.Module):
    """BN-ReLU-Conv1x1 -> BN-ReLU-Conv3x3 bottleneck (``densenet.py:33-59``)."""

    growth_rate: int
    bn_size: int = 4
    drop_rate: float = 0.0
    memory_efficient: bool = False
    dtype: Any = None
    bn_axis_name: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        def bottleneck(h):
            h = _bn(train, name="norm1", dtype=self.dtype, axis_name=self.bn_axis_name)(h)
            h = nn.relu(h)
            h = nn.Conv(
                self.bn_size * self.growth_rate,
                (1, 1),
                padding="VALID",
                use_bias=False,
                kernel_init=kaiming_normal_out,
                dtype=self.dtype,
                name="conv1",
            )(h)
            return h

        out = bottleneck(x)
        out = _bn(train, name="norm2", dtype=self.dtype, axis_name=self.bn_axis_name)(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.growth_rate,
            (3, 3),
            padding=[(1, 1), (1, 1)],
            use_bias=False,
            kernel_init=kaiming_normal_out,
            dtype=self.dtype,
            name="conv2",
        )(out)
        if self.drop_rate > 0:
            out = nn.Dropout(rate=self.drop_rate, deterministic=not train)(out)
        return out


class DenseBlock(nn.Module):
    """Concatenative dense block (``densenet.py:62-80``)."""

    num_layers: int
    growth_rate: int
    bn_size: int = 4
    drop_rate: float = 0.0
    memory_efficient: bool = False
    dtype: Any = None
    bn_axis_name: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        features = x
        # memory_efficient remats each layer: recompute activations in the
        # backward pass instead of storing the wide concatenated inputs.
        layer_cls = (
            nn.checkpoint(DenseLayer, static_argnums=(2,))
            if self.memory_efficient
            else DenseLayer
        )
        for i in range(self.num_layers):
            new = layer_cls(
                growth_rate=self.growth_rate,
                bn_size=self.bn_size,
                drop_rate=self.drop_rate,
                memory_efficient=self.memory_efficient,
                dtype=self.dtype,
                bn_axis_name=self.bn_axis_name,
                name=f"denselayer{i + 1}",
            )(features, train)
            features = jnp.concatenate([features, new], axis=-1)
        return features


class Transition(nn.Module):
    """BN-ReLU-Conv1x1-AvgPool2 transition (``densenet.py:83-90``)."""

    features: int
    dtype: Any = None
    bn_axis_name: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = _bn(train, name="norm", dtype=self.dtype, axis_name=self.bn_axis_name)(x)
        x = nn.relu(x)
        x = nn.Conv(
            self.features,
            (1, 1),
            padding="VALID",
            use_bias=False,
            kernel_init=kaiming_normal_out,
            dtype=self.dtype,
            name="conv",
        )(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DenseNet(nn.Module):
    """Headless ImageNet DenseNet-BC (``densenet.py:93-163``)."""

    growth_rate: int = 32
    block_config: Sequence[int] = (6, 12, 24, 16)
    num_init_features: int = 64
    bn_size: int = 4
    drop_rate: float = 0.0
    memory_efficient: bool = False
    dtype: Any = None
    bn_axis_name: Any = None
    pretrained_path: Any = None  # local torchvision checkpoint, merged at init

    @property
    def feat_dim(self) -> int:
        n = self.num_init_features
        for i, layers in enumerate(self.block_config):
            n += layers * self.growth_rate
            if i != len(self.block_config) - 1:
                n //= 2
        return n

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = nn.Conv(
            self.num_init_features,
            (7, 7),
            strides=(2, 2),
            padding=[(3, 3), (3, 3)],
            use_bias=False,
            kernel_init=kaiming_normal_out,
            dtype=self.dtype,
            name="conv0",
        )(x)
        x = _bn(train, name="norm0", dtype=self.dtype, axis_name=self.bn_axis_name)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        num_features = self.num_init_features
        for i, num_layers in enumerate(self.block_config):
            x = DenseBlock(
                num_layers=num_layers,
                growth_rate=self.growth_rate,
                bn_size=self.bn_size,
                drop_rate=self.drop_rate,
                memory_efficient=self.memory_efficient,
                dtype=self.dtype,
                bn_axis_name=self.bn_axis_name,
                name=f"denseblock{i + 1}",
            )(x, train=train)
            num_features += num_layers * self.growth_rate
            if i != len(self.block_config) - 1:
                x = Transition(
                    num_features // 2, dtype=self.dtype,
                    bn_axis_name=self.bn_axis_name, name=f"transition{i + 1}"
                )(x, train=train)
                num_features //= 2

        x = _bn(train, name="norm5", dtype=self.dtype, axis_name=self.bn_axis_name)(x)
        x = nn.relu(x)
        # adaptive_avg_pool2d((1,1)) + flatten; pooled in f32.
        return jnp.mean(x.astype(jnp.float32), axis=(1, 2))


class CIFAR_DenseNetModule(nn.Module):
    """CIFAR-scale DenseNet-BC, headless (``densenet3.py:37-83``)."""

    nblocks: Sequence[int] = (6, 12, 24, 16)
    growth_rate: int = 12
    reduction: float = 0.5
    dtype: Any = None
    bn_axis_name: Any = None
    pretrained_path: Any = None

    @property
    def feat_dim(self) -> int:
        num_planes = 2 * self.growth_rate
        for i, nb in enumerate(self.nblocks):
            num_planes += nb * self.growth_rate
            if i != len(self.nblocks) - 1:
                num_planes = int(math.floor(num_planes * self.reduction))
        return num_planes

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        num_planes = 2 * self.growth_rate
        x = nn.Conv(
            num_planes,
            (3, 3),
            padding=[(1, 1), (1, 1)],
            use_bias=False,
            kernel_init=kaiming_normal_out,
            dtype=self.dtype,
            name="conv1",
        )(x)

        for i, nb in enumerate(self.nblocks):
            for j in range(nb):
                # Pre-act bottleneck: BN-ReLU-Conv1x1(4g) -> BN-ReLU-Conv3x3(g),
                # concat input last (densenet3.py:18-22).
                h = _bn(train, name=f"d{i}_{j}_bn1", dtype=self.dtype, axis_name=self.bn_axis_name)(x)
                h = nn.relu(h)
                h = nn.Conv(
                    4 * self.growth_rate,
                    (1, 1),
                    padding="VALID",
                    use_bias=False,
                    kernel_init=kaiming_normal_out,
                    dtype=self.dtype,
                    name=f"d{i}_{j}_conv1",
                )(h)
                h = _bn(train, name=f"d{i}_{j}_bn2", dtype=self.dtype, axis_name=self.bn_axis_name)(h)
                h = nn.relu(h)
                h = nn.Conv(
                    self.growth_rate,
                    (3, 3),
                    padding=[(1, 1), (1, 1)],
                    use_bias=False,
                    kernel_init=kaiming_normal_out,
                    dtype=self.dtype,
                    name=f"d{i}_{j}_conv2",
                )(h)
                x = jnp.concatenate([h, x], axis=-1)
            num_planes += nb * self.growth_rate
            if i != len(self.nblocks) - 1:
                out_planes = int(math.floor(num_planes * self.reduction))
                h = _bn(train, name=f"t{i}_bn", dtype=self.dtype, axis_name=self.bn_axis_name)(x)
                h = nn.relu(h)
                h = nn.Conv(
                    out_planes,
                    (1, 1),
                    padding="VALID",
                    use_bias=False,
                    kernel_init=kaiming_normal_out,
                    dtype=self.dtype,
                    name=f"t{i}_conv",
                )(h)
                x = nn.avg_pool(h, (2, 2), strides=(2, 2))
                num_planes = out_planes

        x = _bn(train, name="bn_final", dtype=self.dtype, axis_name=self.bn_axis_name)(x)
        x = nn.relu(x)
        x = nn.avg_pool(x.astype(jnp.float32), (4, 4), strides=(4, 4))
        return x.reshape(x.shape[0], -1)


# ---------------------------------------------------------------------------
# Constructors (densenet.py:193-242, densenet3.py:85-86)
# ---------------------------------------------------------------------------

def densenet121(**kw) -> DenseNet:
    return DenseNet(growth_rate=32, block_config=(6, 12, 24, 16), num_init_features=64, **kw)


def densenet161(**kw) -> DenseNet:
    return DenseNet(growth_rate=48, block_config=(6, 12, 36, 24), num_init_features=96, **kw)


def densenet169(**kw) -> DenseNet:
    return DenseNet(growth_rate=32, block_config=(6, 12, 32, 32), num_init_features=64, **kw)


def densenet201(**kw) -> DenseNet:
    return DenseNet(growth_rate=32, block_config=(6, 12, 48, 32), num_init_features=64, **kw)


def CIFAR_DenseNet121(**kw) -> CIFAR_DenseNetModule:
    return CIFAR_DenseNetModule(nblocks=(6, 12, 24, 16), growth_rate=32, **kw)
