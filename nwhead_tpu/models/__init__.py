"""Backbone model zoo registry.

Name -> constructor lookup, equivalent to the reference's
``load_model(name, pretrained, **kw)`` registry (``model/__init__.py:5-8``)
but explicit rather than via ``globals()``. All backbones are headless: they
return pooled feature vectors.

``pretrained`` weights are imported from torchvision checkpoints via
``nwhead_tpu.models.torch_import`` (pass a local ``state_dict`` path — this
environment has no network egress).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn

from nwhead_tpu.models import resnet as _resnet
from nwhead_tpu.models import densenet as _densenet
from nwhead_tpu.models import vit as _vit

_REGISTRY = {
    "resnet10": _resnet.resnet10,
    "resnet18": _resnet.resnet18,
    "resnet34": _resnet.resnet34,
    "resnet50": _resnet.resnet50,
    "resnet101": _resnet.resnet101,
    "resnet152": _resnet.resnet152,
    "resnext50_32x4d": _resnet.resnext50_32x4d,
    "resnext101_32x8d": _resnet.resnext101_32x8d,
    "CIFAR_ResNet10": _resnet.CIFAR_ResNet10,
    "CIFAR_ResNet18": _resnet.CIFAR_ResNet18,
    "CIFAR_ResNet34": _resnet.CIFAR_ResNet34,
    "densenet121": _densenet.densenet121,
    "densenet161": _densenet.densenet161,
    "densenet169": _densenet.densenet169,
    "densenet201": _densenet.densenet201,
    "CIFAR_DenseNet121": _densenet.CIFAR_DenseNet121,
    "vit_s14": _vit.vit_s14,  # the reference's dinov2_vits14 arch (feat 384)
    "dinov2_vits14": _vit.vit_s14,
    "vit_b14": _vit.vit_b14,
    "vit_l14": _vit.vit_l14,
    "vit_s16": _vit.vit_s16,
}

MODEL_NAMES = tuple(_REGISTRY)


def load_model(name: str, pretrained: Any = False, **kwargs: Any) -> nn.Module:
    """Build a backbone by name (``model/__init__.py:5-8`` registry).

    ``pretrained`` may be False (random init) or a path to a local
    torchvision/DINOv2-format checkpoint (``.pth``/``.pt``/``.npz``). With a
    path, the returned module carries ``pretrained_path`` and every init
    entry point (``NWNet.init``, the trainers, ``FCNet`` via trainers) merges
    the converted weights into the fresh variable tree, strict=False style —
    the reference's pretrained workflow (``model/resnet.py:259-267``,
    ``train.py:212-214``) without network egress.
    """
    if name not in _REGISTRY:
        raise KeyError(f"Unknown model {name!r}; valid: {MODEL_NAMES}")
    if pretrained is True:
        raise ValueError(
            "pretrained=True needs a checkpoint path (no network egress "
            "here): load_model(name, pretrained='/path/to/weights.pth')"
        )
    if pretrained:
        kwargs = dict(kwargs, pretrained_path=str(pretrained))
    return _REGISTRY[name](**kwargs)


def feature_dim(name: str, **kwargs: Any) -> int:
    """Output feature dimension of a backbone (``train.py:200-214``)."""
    return _REGISTRY[name](**kwargs).feat_dim
