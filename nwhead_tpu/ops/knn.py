"""Exact k-nearest-neighbor support construction.

Device-side equivalent of the reference's ``KNN`` (``nwhead/utils.py:178-193``):
exact L2 neighbors via a distance matrix; instead of host argsort we use
``jax.lax.top_k`` on the negated distances (O(S log k) on device).

The reference concatenates all queries' neighbor features into one flat
``(bs * k, d)`` support, which the NW head then *shares across the whole
batch* (the 2-D support broadcast, ``nw.py:277-279``) — i.e. the effective
knn support is the union (with duplicates) of the batch's neighbor sets.
This observed behavior (a quirk, per SURVEY.md §2.2) is reproduced exactly.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nwhead_tpu.ops.kernels import pairwise_sqdist


@partial(jax.jit, static_argnames=("k",))
def knn_indices(x: jnp.ndarray, bank: jnp.ndarray, k: int) -> jnp.ndarray:
    """Indices of the k nearest bank rows per query (exact, squared-L2).

    x: (B, d), bank: (S, d) -> (B, k) int32.
    """
    d2 = pairwise_sqdist(x[None], bank[None])[0]  # (B, S)
    _, idx = jax.lax.top_k(-d2, k)
    return idx


@partial(jax.jit, static_argnames=("k", "chunk"))
def knn_indices_chunked(
    x: jnp.ndarray, bank: jnp.ndarray, k: int, chunk: int = 65536
) -> jnp.ndarray:
    """Exact k-NN over banks too large to materialize a (B, S) distance
    matrix: lax.scan over bank chunks with a running top-k merge —
    O(B * chunk) memory regardless of S. Bank must be padded to a chunk
    multiple by the caller (pad rows at +inf distance via zero-masking is
    unnecessary: use knn_indices for small banks instead).
    """
    B = x.shape[0]
    S = bank.shape[0]
    assert S % chunk == 0, "pad the bank to a chunk multiple"
    n_chunks = S // chunk
    bank_c = bank.reshape(n_chunks, chunk, -1)

    def step(carry, inputs):
        best_scores, best_idx = carry  # (B, k) each
        chunk_bank, chunk_start = inputs
        d2 = pairwise_sqdist(x[None], chunk_bank[None])[0]  # (B, chunk)
        s, i = jax.lax.top_k(-d2, k)  # best within this chunk
        i = i + chunk_start
        merged_s = jnp.concatenate([best_scores, s], axis=1)  # (B, 2k)
        merged_i = jnp.concatenate([best_idx, i], axis=1)
        top_s, pos = jax.lax.top_k(merged_s, k)
        top_i = jnp.take_along_axis(merged_i, pos, axis=1)
        return (top_s, top_i), None

    starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    init = (
        jnp.full((B, k), -jnp.inf, jnp.float32),
        jnp.zeros((B, k), jnp.int32),
    )
    (scores, idx), _ = jax.lax.scan(step, init, (bank_c, starts))
    return idx


class ExactKNN:
    """Callable mirroring the reference ``KNN`` interface: ``knn(x) ->
    (support_features (B * k, d), support_labels (B * k,))``.

    ``host=True`` keeps the bank as HOST numpy and searches with numpy —
    for mesh-attached nets whose device HBM holds only bank SHARDS (the
    sharded knn path serves the common case; this is the fallback when it
    can't, e.g. prepared-mode banks or k beyond a shard)."""

    def __init__(
        self,
        data: np.ndarray,
        labels: np.ndarray,
        n_neighbors: int = 20,
        host: bool = False,
    ):
        self.host = host
        if host:
            self.data = np.asarray(data)
            # Static bank-norm term of the expansion, computed once (the
            # bank is immutable for this instance's lifetime).
            self._data2 = (self.data.astype(np.float32) ** 2).sum(-1)
        else:
            self.data = jnp.asarray(data)  # single device-resident bank:
            # the search AND the neighbor gather both run on-chip (no host
            # mirror — 1x memory for large banks).
        self.labels = np.asarray(labels)
        self.n_neighbors = n_neighbors

    def __call__(self, x) -> Tuple[jnp.ndarray, np.ndarray]:
        k = self.n_neighbors
        if self.host:
            xq = np.asarray(x, dtype=np.float32)
            # (B, S) squared distances via the expansion (no (B, S, d)
            # intermediate); exact, like the device path.
            d2 = (
                (xq ** 2).sum(-1, keepdims=True)
                - 2.0 * xq @ self.data.T
                + self._data2[None, :]
            )
            # Stable full sort: equal distances keep ascending bank index —
            # exactly lax.top_k's tie-break, so duplicate rows straddling
            # the k boundary select the SAME neighbors as the device path
            # (argpartition's within-partition tie order is unspecified).
            idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
            flat = idx.reshape(-1)
            return jnp.asarray(self.data[flat]), self.labels[flat]
        idx = np.asarray(knn_indices(jnp.asarray(x), self.data, k))
        flat = idx.reshape(-1)  # flat-concat union support (utils.py:191-192)
        return jnp.take(self.data, jnp.asarray(flat), axis=0), self.labels[flat]
