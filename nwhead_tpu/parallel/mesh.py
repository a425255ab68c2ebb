"""Device-mesh helpers.

The framework's parallel axes (SURVEY.md §2.5):
  * ``data``    — batch/query sharding (DP);
  * ``support`` — support-bank sharding (the SP/sequence-parallel analog:
    the NW op's scaling axis is support size S, so S shards across devices
    and full-mode inference combines per-shard online-softmax partials);
  * ``model``   — tensor-parallel feature-dim sharding (size 1 by default:
    backbones at this scale don't need TP, but the axis is provided per the
    checklist so feature-dim-sharded layers can be expressed — see
    ``model_sharding`` and tests/test_parallel.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_support: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a ('data', 'support', 'model') mesh over the available devices.

    Defaults: all devices on the data axis if axes unspecified; the model
    (tensor-parallel) axis defaults to size 1.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % n_model == 0, (n_model, n)
    n_rest = n // n_model
    if n_data is None and n_support is None:
        n_data, n_support = n_rest, 1
    elif n_data is None:
        n_data = n_rest // n_support
    elif n_support is None:
        n_support = n_rest // n_data
    assert n_data * n_support * n_model == n, (n_data, n_support, n_model, n)
    arr = np.asarray(devices).reshape(n_data, n_support, n_model)
    return Mesh(arr, axis_names=("data", "support", "model"))


def support_sharding(mesh: Mesh) -> NamedSharding:
    """Rows sharded over the support axis (bank features/labels/mask)."""
    return NamedSharding(mesh, P("support"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over the data axis."""
    return NamedSharding(mesh, P("data"))


def model_sharding(mesh: Mesh) -> NamedSharding:
    """Feature (last) dim sharded over the model (tensor-parallel) axis —
    e.g. a Dense kernel sharded (None, 'model') so each device holds a
    column slice and XLA all-gathers activations where needed."""
    return NamedSharding(mesh, P(None, "model"))
