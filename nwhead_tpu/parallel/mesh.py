"""Device-mesh helpers.

The framework's two parallel axes (SURVEY.md §2.5):
  * ``data``    — batch/query sharding (DP);
  * ``support`` — support-bank sharding (the SP/sequence-parallel analog:
    the NW op's scaling axis is support size S, so S shards across devices
    and full-mode inference combines per-shard online-softmax partials).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_support: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a ('data', 'support') mesh over the available devices.

    Defaults: all devices on the data axis if axes unspecified.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data is None and n_support is None:
        n_data, n_support = n, 1
    elif n_data is None:
        n_data = n // n_support
    elif n_support is None:
        n_support = n // n_data
    assert n_data * n_support == n, (n_data, n_support, n)
    arr = np.asarray(devices).reshape(n_data, n_support)
    return Mesh(arr, axis_names=("data", "support"))


def support_sharding(mesh: Mesh) -> NamedSharding:
    """Rows sharded over the support axis (bank features/labels/mask)."""
    return NamedSharding(mesh, P("support"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over the data axis."""
    return NamedSharding(mesh, P("data"))
