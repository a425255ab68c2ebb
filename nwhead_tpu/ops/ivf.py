"""IVF-pruned fused NW serving: sublinear exact-subset full mode.

The reference's answer to "the support bank got huge" is host-side
approximate retrieval — hnswlib over the feature bank plus a full NW pass
over the union of per-query neighbor sets (``/root/reference/nwhead/
support.py:135-154``; knn mode semantics in ``nwhead/nw.py:127-160``).
Measured head-to-head on this chip (BASELINE.md), the exact full-mode head
already beats that strategy by ~75-200x at 1M rows because streaming the
whole bank through the MXU costs less than pointer-chasing a graph on the
host. What the exact head cannot dodge is the bank DMA itself: at 16M rows
(4.1 GB int4) every query batch streams the entire bank, and throughput is
pinned at the HBM roofline.

This module is the TPU-native IVF answer, built out of parts the prepared
serving path already has:

* **Build** (``prepare_support_ivf``): k-means the kernel-normalized bank
  (matmul-form Lloyd on a subsample, chunked assignment — never an
  O(S*K*D) temp), stable-sort rows by cluster, and prepare the sorted bank
  with the normal ``prepare_support`` machinery. Because rows are now
  spatially coherent, each fixed 1024-row bank TILE has a meaningful
  centroid; those per-tile centroids (plus a validity flag) are the entire
  routing index — no graph, no host structure, rebuild = one sort.
* **Route** (``nw_fused_ivf_log_probs``): one (B, n_tiles) matmul against
  the tile centroids, per-query top-``n_probe`` tiles, one sort+dedup to a
  fixed-size union (static shapes: the union can never exceed
  ``min(B * n_probe, n_tiles)`` slots), then the prepared double-buffered
  kernel streams ONLY those tiles (``tile_sel``): empty slots skip their
  DMA and the whole tile body inside the kernel, so cost scales with the
  union size, not the bank.

Semantics match the reference's knn mode: the NW softmax runs over the
union-of-batch retrieved subset (the reference concatenates per-query
neighbor lists the same way). With ``n_probe >= n_tiles`` the output is
exactly the full-mode answer (tested); with clustered data and small
``n_probe`` it is the full-mode answer whenever the routing recalls the
probability mass (top-1 agreement measured in ``scripts/ivf_lab.py``).

Works for every prepared-bank precision (f32/bf16/int8/int4) and with
``meta_stream`` giant-bank layouts — the selection rides next to the
existing DMA machinery rather than replacing it.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .pallas_nw import (
    PreparedSupport,
    _resolve_mode,
    _round_up,
    nw_fused_from_prepared,
    prepare_support,
)


class IVFPrepared(NamedTuple):
    """A prepared bank plus its tile-routing index (all arrays — rides as a
    jit argument like ``PreparedSupport``)."""

    prep: PreparedSupport
    cents: jnp.ndarray   # (n_tiles, d_pad) f32 tile centroids, normalized space
    c2: jnp.ndarray      # (n_tiles,) f32 centroid self-norms (l2 routing)
    cvalid: jnp.ndarray  # (n_tiles,) f32 1/0 — tile holds any valid row


@partial(jax.jit, static_argnames=("k", "n_iter"))
def _kmeans_fit(key, x, k, n_iter):
    """Matmul-form Lloyd on a fully-valid sample. x: (n, d) f32 ->
    (k, d) centroids. Peak temp is the (n, k) affinity matrix — never the
    (n, k, d) broadcast the per-class clusterer uses (fine at its
    episodic scale, fatal at bank scale)."""
    n = x.shape[0]
    cents = x[jax.random.permutation(key, n)[:k]]

    def step(_, cents):
        aff = 2.0 * (x @ cents.T) - jnp.sum(cents * cents, axis=1)[None, :]
        assign = jnp.argmax(aff, axis=1)
        oh = jax.nn.one_hot(assign, k, dtype=x.dtype)
        counts = jnp.sum(oh, axis=0)
        sums = oh.T @ x
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        return jnp.where(counts[:, None] > 0, new, cents)

    return jax.lax.fori_loop(0, n_iter, step, cents)


@jax.jit
def _assign_chunk(xc, cents):
    aff = 2.0 * (xc @ cents.T) - jnp.sum(cents * cents, axis=1)[None, :]
    return jnp.argmax(aff, axis=1)


@partial(jax.jit, static_argnames=("n_tiles", "block_s", "d_pad"))
def _tile_centroids(sn, mask, n_tiles, block_s, d_pad):
    """Mean of each tile's valid rows in normalized feature space.
    sn: (S, d) f32, mask: (S,) f32. Returns (cents, c2, cvalid)."""
    S, d = sn.shape
    s_pad = n_tiles * block_s
    x = jnp.pad(sn.astype(jnp.float32), ((0, s_pad - S), (0, d_pad - d)))
    m = jnp.pad(mask.astype(jnp.float32), (0, s_pad - S))
    x = x * m[:, None]
    xt = x.reshape(n_tiles, block_s, d_pad)
    counts = m.reshape(n_tiles, block_s).sum(axis=1)
    cents = xt.sum(axis=1) / jnp.maximum(counts, 1.0)[:, None]
    return cents, jnp.sum(cents * cents, axis=1), (counts > 0).astype(jnp.float32)


def prepare_support_ivf(
    sfeat: jnp.ndarray,
    sy: jnp.ndarray,
    n_classes: int,
    *,
    kernel: str = "euclidean",
    precision: str = "f32",
    support_mask: Optional[jnp.ndarray] = None,
    block_s: Optional[int] = None,
    n_clusters: Optional[int] = None,
    cluster_iters: int = 10,
    sample: int = 65536,
    seed: int = 0,
    assign_chunk: int = 65536,
) -> IVFPrepared:
    """Build an IVF-routable prepared bank (host-side build, like
    ``prepare_support``).

    ``n_clusters`` defaults to the bank's tile count — one cluster per
    1024-row tile is the natural routing granularity (the kernel streams
    whole tiles either way). The Lloyd fit runs on a ``sample``-row
    subsample (routing needs coarse structure, not optimal centroids);
    assignment of all rows is chunked matmuls.

    Rows are sorted by cluster, which precludes the class-sorted window
    layout (``window=False``) — IVF targets huge many-class banks where
    pruned DMA dominates what windows save on the aggregation matmul.
    """
    if support_mask is None:
        support_mask = jnp.ones(sfeat.shape[0], dtype=jnp.float32)
    mode, _, _, sn = _resolve_mode(
        kernel, {"logit_scale": jnp.float32(0.0)}, sfeat[:1], sfeat
    )
    S, D = sn.shape
    if block_s is None:
        block_s = 1024
    block_s = min(_round_up(block_s, 128), _round_up(S, 128))
    n_tiles_est = _round_up(S, block_s) // block_s
    k = n_clusters or max(2, min(n_tiles_est, 65536))
    k = min(k, S)

    key = jax.random.PRNGKey(seed)
    ksamp, kfit = jax.random.split(key)
    # Fit on a subsample of the VALID rows (masked rows carry zeros or
    # untrusted content; they sort last regardless of their assignment).
    mask_np = np.asarray(support_mask) > 0
    valid_idx = np.nonzero(mask_np)[0]
    if valid_idx.size == 0:
        raise ValueError("prepare_support_ivf needs at least one valid row")
    n_fit = min(sample, valid_idx.size)
    pick = np.asarray(
        jax.random.choice(ksamp, valid_idx.size, (n_fit,), replace=False)
    )
    fit_x = jnp.asarray(sn[valid_idx[pick]], jnp.float32)
    k = min(k, n_fit)
    cents_fit = _kmeans_fit(kfit, fit_x, k, cluster_iters)

    assign = np.empty(S, np.int64)
    for lo in range(0, S, assign_chunk):
        hi = min(lo + assign_chunk, S)
        assign[lo:hi] = np.asarray(
            _assign_chunk(sn[lo:hi].astype(jnp.float32), cents_fit)
        )
    # Masked rows last (cluster id k sorts past every real cluster).
    assign = np.where(mask_np, assign, k)
    order = np.argsort(assign, kind="stable")

    sfeat_s = jnp.asarray(sfeat)[order]
    sy_s = jnp.asarray(sy)[order]
    mask_s = jnp.asarray(support_mask)[order]
    prep = prepare_support(
        sfeat_s, sy_s, n_classes, kernel=kernel, precision=precision,
        support_mask=mask_s, block_s=block_s, window=False,
    )
    n_tiles = prep.lane.shape[0]
    block_s_used = prep.lane.shape[1] * 128
    # Routing width: pad to a lane multiple (independent of how the bank
    # itself is stored — int4 packs two features per byte, the router
    # works in plain f32).
    d_pad = _round_up(D, 128)
    mode2, _, _, sn_s = _resolve_mode(
        kernel, {"logit_scale": jnp.float32(0.0)}, sfeat_s[:1], sfeat_s
    )
    assert mode2 == mode
    cents, c2, cvalid = _tile_centroids(
        sn_s, mask_s, n_tiles, block_s_used, d_pad
    )
    return IVFPrepared(prep=prep, cents=cents, c2=c2, cvalid=cvalid)


def select_tiles(affinity: jnp.ndarray, n_probe: int) -> jnp.ndarray:
    """Per-query top-``n_probe`` tiles -> fixed-size batch union.

    affinity: (B, n_tiles). Returns (n_sel,) int32 — unique selected tile
    ids in ascending order, ``-1``-padded; ``n_sel = min(B * n_probe,
    n_tiles)`` (the union can never be larger, so no valid id is ever
    dropped). Jit-friendly: static shapes, one top_k + two sorts."""
    B, n_tiles = affinity.shape
    n_probe = min(n_probe, n_tiles)
    _, ids = jax.lax.top_k(affinity, n_probe)
    flat = jnp.sort(ids.reshape(-1))
    dup = jnp.concatenate(
        [jnp.zeros((1,), bool), flat[1:] == flat[:-1]]
    )
    uniq = jnp.sort(jnp.where(dup, n_tiles, flat))
    n_sel = min(B * n_probe, n_tiles)
    uniq = uniq[:n_sel]
    return jnp.where(uniq >= n_tiles, -1, uniq).astype(jnp.int32)


def route_tiles(
    qn: jnp.ndarray,
    ivf: IVFPrepared,
    n_probe: int,
    *,
    mode: str,
) -> jnp.ndarray:
    """Tile selection for a (normalized) query batch: one matmul against
    the tile centroids + ``select_tiles``. For l2-kernels ranking uses
    ``2 q.c - |c|^2`` (monotone in ``-|q - c|^2``); dot-family kernels
    rank by the dot itself. Empty tiles are never selected."""
    d_pad = ivf.cents.shape[1]
    qf = qn.astype(jnp.float32)
    qf = jnp.pad(qf, ((0, 0), (0, d_pad - qf.shape[1])))
    aff = qf @ ivf.cents.T
    if mode == "l2":
        aff = 2.0 * aff - ivf.c2[None, :]
    aff = jnp.where(ivf.cvalid[None, :] > 0, aff, -jnp.inf)
    return select_tiles(aff, n_probe)


def nw_fused_ivf_log_probs(
    qfeat: jnp.ndarray,
    ivf: IVFPrepared,
    n_classes: int,
    *,
    kernel: str = "euclidean",
    kernel_params: Optional[Dict[str, Any]] = None,
    n_probe: int = 32,
    block_b: Optional[int] = None,
    interpret: Optional[bool] = None,
    **prepared_kwargs: Any,
) -> jnp.ndarray:
    """IVF-pruned NW log-probs: route, then stream only the selected
    tiles through the prepared serving kernel. Fully jittable with
    ``ivf`` as a jit argument (the 413 lesson — never close over banks).

    ``n_probe`` is the recall knob: tiles per query before the batch
    union. ``n_probe >= n_tiles`` reproduces full mode exactly."""
    mode, _, qn, _ = _resolve_mode(
        kernel, kernel_params or {}, qfeat, qfeat[:1]
    )
    tsel = route_tiles(qn, ivf, n_probe, mode=mode)
    return nw_fused_from_prepared(
        qfeat, ivf.prep, n_classes, kernel=kernel,
        kernel_params=kernel_params, block_b=block_b, interpret=interpret,
        tile_sel=tsel, **prepared_kwargs,
    )
