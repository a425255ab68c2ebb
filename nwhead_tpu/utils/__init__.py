"""Misc utilities: model summary, seeding."""

from __future__ import annotations

import jax
import numpy as np


def summary(module, variables) -> int:
    """Print the module tree and trainable parameter count
    (``util/utils.py:13-29`` equivalent). Returns the param count."""
    print()
    print("Model Summary")
    print("---------------------------------------------------------------")
    print(module)
    print("---------------------------------------------------------------")
    print("Trainable parameters:")
    leaves = jax.tree_util.tree_leaves_with_path(variables.get("params", variables))
    total = 0
    for path, leaf in leaves:
        print(jax.tree_util.keystr(path), leaf.shape)
        total += int(np.prod(leaf.shape))
    print()
    print("Total parameters:", total)
    print("---------------------------------------------------------------")
    print()
    return total


def linear_normalization(arr: np.ndarray, new_range=(0, 1)) -> np.ndarray:
    """Per-image min/max rescale for debug visualization
    (``nwhead/utils.py:161-176``). arr: (B, H, W, C), NHWC."""
    arr = np.asarray(arr, dtype=np.float32)
    bs = arr.shape[0]
    flat = arr.reshape(bs, -1, arr.shape[-1])
    mx = flat.max(axis=1)[:, None, None, :]
    mn = flat.min(axis=1)[:, None, None, :]
    mx = np.where(mx == 0, 1.0, mx)
    lo, hi = new_range
    return (arr - mn) * (hi - lo) / (mx - mn) + lo
