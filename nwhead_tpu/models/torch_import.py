"""Import torchvision-format checkpoints into nwhead_tpu backbones.

The reference loads pretrained torchvision weights with ``strict=False``
(``model/resnet.py:259-267``, ``model/densenet.py:167-182``). Here we convert
a torch ``state_dict`` (loaded from a local file — no network egress) into the
Flax ``{'params': ..., 'batch_stats': ...}`` trees of our headless models.

Conventions:
  * conv kernels: torch OIHW -> flax HWIO (transpose (2, 3, 1, 0)).
  * BatchNorm: weight/bias -> scale/bias; running_mean/var -> batch_stats.
  * classifier/fc weights are skipped (our models are headless).
  * densenet legacy 'norm.1'-style keys are re-mapped like the reference's
    ``_load_state_dict`` pattern (``densenet.py:167-182``).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _assign(tree: Dict[str, Any], path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _convert_tensor(name: str, t) -> np.ndarray:
    arr = np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)
    if arr.ndim == 4:  # conv kernel OIHW -> HWIO
        arr = arr.transpose(2, 3, 1, 0)
    return arr


_BN_PARAM = {"weight": "scale", "bias": "bias"}
_BN_STAT = {"running_mean": "mean", "running_var": "var"}

# densenet legacy key pattern (reference densenet.py:172-173)
_DENSE_LEGACY = re.compile(
    r"^(.*denselayer\d+\.(?:norm|relu|conv))\.((?:[12])\.(?:weight|bias|running_mean|running_var))$"
)


def _resnet_path(key: str) -> Tuple[str, ...]:
    """torchvision resnet key -> our module path (without leaf)."""
    parts = key.split(".")
    if parts[0] in ("conv1", "bn1"):
        return (parts[0],)
    m = re.match(r"layer(\d)", parts[0])
    if m:
        block = f"layer{m.group(1)}_{parts[1]}"
        if parts[2] == "downsample":
            sub = "ds_conv" if parts[3] == "0" else "ds_bn"
            return (block, sub)
        return (block, parts[2])
    raise KeyError(key)


def _densenet_path(key: str) -> Tuple[str, ...]:
    parts = key.split(".")
    assert parts[0] == "features"
    rest = parts[1:]
    if rest[0] in ("conv0", "norm0", "norm5"):
        return (rest[0],)
    if rest[0].startswith("denseblock"):
        return (rest[0], rest[1], rest[2])
    if rest[0].startswith("transition"):
        return (rest[0], rest[1])
    raise KeyError(key)


def convert_state_dict(
    state_dict: Mapping[str, Any], arch: str
) -> Dict[str, Dict[str, Any]]:
    """Convert a torchvision ``state_dict`` into ``{'params', 'batch_stats'}``
    trees for the same-named nwhead_tpu backbone."""
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}
    is_dense = arch.startswith("densenet")
    path_fn = _densenet_path if is_dense else _resnet_path

    items = dict(state_dict)
    if is_dense:  # legacy 'norm.1' key remap
        for key in list(items):
            m = _DENSE_LEGACY.match(key)
            if m:
                items[m.group(1) + m.group(2)] = items.pop(key)

    for key, tensor in items.items():
        leaf = key.split(".")[-1]
        if key.startswith(("fc.", "classifier.")):
            continue  # headless models have no classifier
        if leaf == "num_batches_tracked":
            continue
        base = key.rsplit(".", 1)[0]
        path = path_fn(base)
        arr = _convert_tensor(key, tensor)
        is_bn = leaf in _BN_STAT or (
            leaf in _BN_PARAM
            and any(tok.startswith(("bn", "norm", "ds_bn")) for tok in path)
        )
        if leaf in _BN_STAT:
            _assign(batch_stats, path + (_BN_STAT[leaf],), arr)
        elif is_bn:
            _assign(params, path + (_BN_PARAM[leaf],), arr)
        elif leaf == "weight":
            name = "kernel"
            _assign(params, path + (name,), arr)
        elif leaf == "bias":
            _assign(params, path + ("bias",), arr)
        else:
            raise KeyError(f"Unhandled key {key}")
    return {"params": params, "batch_stats": batch_stats}


def convert_vit_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, Dict[str, Any]]:
    """Convert a DINOv2-format ViT ``state_dict`` into our
    ``VisionTransformer`` params (no batch stats — ViT has none).

    Key mapping: ``blocks.i.attn.qkv`` -> ``block{i}/attn/qkv`` (Dense
    kernels transposed to (in, out)), ``ls1.gamma`` -> ``ls1_gamma``,
    ``patch_embed.proj`` -> ``patch_embed`` (OIHW -> HWIO), top-level
    ``cls_token`` / ``pos_embed`` / ``norm`` passed through.
    """
    params: Dict[str, Any] = {}

    def put(path, arr):
        _assign(params, path, np.asarray(arr))

    for key, t in state_dict.items():
        arr = np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)
        parts = key.split(".")
        if key == "cls_token":
            put(("cls_token",), arr)
        elif key == "pos_embed":
            put(("pos_embed",), arr)
        elif key == "mask_token":
            continue  # SSL-only artifact
        elif key.startswith("patch_embed.proj."):
            if parts[-1] == "weight":
                put(("patch_embed", "kernel"), arr.transpose(2, 3, 1, 0))
            else:
                put(("patch_embed", "bias"), arr)
        elif key.startswith("norm."):
            put(("norm", "scale" if parts[-1] == "weight" else "bias"), arr)
        elif parts[0] == "blocks":
            i = int(parts[1])
            blk = f"block{i}"
            rest = parts[2:]
            if rest[0] in ("norm1", "norm2"):
                put((blk, rest[0], "scale" if rest[1] == "weight" else "bias"), arr)
            elif rest[0] == "attn":
                leaf = "kernel" if rest[2] == "weight" else "bias"
                put(
                    (blk, "attn", rest[1], leaf),
                    arr.T if leaf == "kernel" else arr,
                )
            elif rest[0] in ("ls1", "ls2"):
                put((blk, f"{rest[0]}_gamma"), arr)
            elif rest[0] == "mlp":
                leaf = "kernel" if rest[2] == "weight" else "bias"
                put((blk, "mlp", rest[1], leaf), arr.T if leaf == "kernel" else arr)
            else:
                raise KeyError(key)
        elif key.startswith("head."):
            continue  # headless
        else:
            raise KeyError(f"Unhandled ViT key {key}")
    return {"params": params}


def arch_kind(module) -> str:
    """Map a backbone module instance to the converter family name."""
    name = type(module).__name__
    if "ResNet" in name:
        return "resnet"
    if "DenseNet" in name:
        return "densenet"
    if "VisionTransformer" in name or name.startswith("ViT"):
        return "vit"
    raise KeyError(f"No pretrained converter for module type {name}")


def load_state_dict_file(path: str) -> Dict[str, Any]:
    """Load a checkpoint file into a flat name->array dict. Supports torch
    ``.pth``/``.pt`` files (``torch.load(map_location='cpu')``) and ``.npz``
    archives (for torch-free environments)."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return dict(obj)


def merge_backbone_pretrained(variables: Dict[str, Any], featurizer) -> Dict[str, Any]:
    """If ``featurizer.pretrained_path`` is set, merge the converted torch
    weights into the ``featurizer`` subtree of a full-model variable tree
    (NWModel/FCNet layout) and return the new tree; otherwise return
    ``variables`` unchanged. This is the init-time hook behind
    ``load_model(name, pretrained=<path>)``."""
    path = getattr(featurizer, "pretrained_path", None)
    if not path:
        return variables
    state_dict = load_state_dict_file(path)
    sub = {"params": dict(variables["params"]["featurizer"])}
    bs_all = variables.get("batch_stats", {})
    if "featurizer" in bs_all:
        sub["batch_stats"] = dict(bs_all["featurizer"])
    merged = load_pretrained(sub, state_dict, arch_kind(featurizer))
    out = dict(variables)
    out["params"] = dict(variables["params"])
    out["params"]["featurizer"] = merged["params"]
    if "featurizer" in bs_all:
        out["batch_stats"] = dict(bs_all)
        out["batch_stats"]["featurizer"] = merged["batch_stats"]
    return out


def load_pretrained(variables: Dict[str, Any], state_dict: Mapping[str, Any], arch: str):
    """Merge converted torch weights into an initialized variable tree,
    strict=False style: keys present in both are replaced, extra reference
    keys are ignored, missing ones keep their initialization."""
    if arch.startswith("vit"):
        converted = convert_vit_state_dict(state_dict)
        converted.setdefault("batch_stats", {})
    else:
        converted = convert_state_dict(state_dict, arch)

    def merge(init_tree, conv_tree):
        out = {}
        for k, v in init_tree.items():
            if k in conv_tree:
                if isinstance(v, dict):
                    out[k] = merge(v, conv_tree[k])
                else:
                    cv = conv_tree[k]
                    if (
                        cv.shape != np.shape(v)
                        and getattr(cv, "ndim", 0) == 4
                        and cv.shape[:2] == (7, 7)
                        and np.shape(v)[:2] == (4, 4)
                        and np.shape(v)[2] == 4 * cv.shape[2]
                    ):
                        # conv7 stem checkpoint into an s2d-stem model:
                        # exact reparameterization (resnet.s2d_stem_kernel).
                        from nwhead_tpu.models.resnet import s2d_stem_kernel

                        cv = s2d_stem_kernel(cv)
                    assert cv.shape == np.shape(v), (k, cv.shape, np.shape(v))
                    out[k] = cv.astype(np.asarray(v).dtype)
            else:
                out[k] = v
        return out

    out = {"params": merge(variables["params"], converted["params"])}
    if "batch_stats" in variables:
        out["batch_stats"] = merge(
            variables["batch_stats"], converted.get("batch_stats", {})
        )
    return out
