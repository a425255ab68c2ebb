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

import warnings
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


@partial(jax.jit, static_argnames=("k",))
def _kmeans_pp_init(key, x, k):
    """k-means++ seeding: each next center drawn w.p. proportional to its
    squared distance from the chosen set. Random-row init at k ~ C covers
    only ~63% of well-separated clusters (coupon collector) and Lloyd
    cannot split a merged pair — which both hurts routing recall and
    (because a merged cluster's rows span two arbitrary classes) blows up
    the dominant-class tile windows. One (n,) distance vector + a k-step
    scan of matvecs — no (n, k) temp until Lloyd itself."""
    n = x.shape[0]
    x2 = jnp.sum(x * x, axis=1)
    kf, key = jax.random.split(key)
    first = jax.random.randint(kf, (), 0, n)
    d2 = jnp.maximum(x2 - 2.0 * (x @ x[first]) + x2[first], 0.0)

    def step(carry, _):
        d2, key = carry
        key, ks = jax.random.split(key)
        idx = jax.random.categorical(ks, jnp.log(jnp.maximum(d2, 1e-30)))
        c = x[idx]
        nd = x2 - 2.0 * (x @ c) + jnp.sum(c * c)
        d2 = jnp.minimum(d2, jnp.maximum(nd, 0.0))
        return (d2, key), idx

    (_, _), rest = jax.lax.scan(step, (d2, key), None, length=k - 1)
    return x[jnp.concatenate([first[None], rest])]


@partial(jax.jit, static_argnames=("k", "n_iter"))
def _kmeans_fit(key, x, k, n_iter):
    """Matmul-form Lloyd on a fully-valid sample. x: (n, d) f32 ->
    (k, d) centroids. Peak temp is the (n, k) affinity matrix — never the
    (n, k, d) broadcast the per-class clusterer uses (fine at its
    episodic scale, fatal at bank scale)."""
    cents = _kmeans_pp_init(key, x, k)

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
    # where, not multiply: masked rows may hold NaN after kernel
    # normalization (zero rows under cosine-family kernels), and NaN*0
    # would poison the tile mean.
    x = jnp.where(m[:, None] > 0, x, 0.0)
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
    order: str = "auto",
) -> IVFPrepared:
    """Build an IVF-routable prepared bank (host-side build, like
    ``prepare_support``).

    ``order`` picks the row layout that makes fixed bank tiles spatially
    coherent (the whole routing index is per-tile centroids):

    * ``"class"`` — sort rows by label. NW serving banks are
      class-clustered by construction (features of one class cluster
      together — that is why the head works), so when classes are at
      least as numerous as tiles each tile sits inside one class
      neighborhood: centroids ≈ class means, no k-means fit at all
      (build = one argsort), and the per-tile class windows that pay for
      the C-scaled aggregation matmul (~1.7 ms of the 4.3 ms exact
      B=256 call at S=1e6/C=1000) come out optimal.
    * ``"cluster"`` — k-means (k-means++ seeded, Lloyd on a ``sample``-row
      subsample, chunked full-bank assignment) then sort by (cluster's
      dominant class, cluster id). For banks whose geometry is FINER than
      the label structure: few classes spread over many tiles, or
      multi-modal classes. Windows ride ``prepare_support(window="keep")``
      and survive only where clusters come out class-pure — a single
      stray row in a merged cluster widens the uniform window to full
      width and drops them (graceful: the plain path is exact).
    * ``"auto"`` (default) — ``"class"`` when ``n_classes >= n_tiles``
      (every tile then maps into one class's neighborhood), else
      ``"cluster"``.

    ``n_clusters`` (cluster order only) defaults to the bank's tile count
    — one cluster per 1024-row tile is the natural routing granularity
    (the kernel streams whole tiles either way).
    """
    if order not in ("auto", "class", "cluster"):
        raise ValueError(f"unknown order {order!r}")
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

    mask_np = np.asarray(support_mask) > 0
    valid_idx = np.nonzero(mask_np)[0]
    if valid_idx.size == 0:
        raise ValueError("prepare_support_ivf needs at least one valid row")
    sy_np = np.asarray(sy).astype(np.int64)
    if order == "auto":
        order = "class" if n_classes >= n_tiles_est else "cluster"

    if order == "class":
        # Stable class sort, masked rows last — identical to the order
        # prepare_support(window=True) would pick itself, so windows are
        # the standard optimal ones.
        perm = np.argsort(
            np.where(mask_np, sy_np, n_classes), kind="stable"
        )
    else:
        key = jax.random.PRNGKey(seed)
        ksamp, kfit = jax.random.split(key)
        # Fit on a subsample of the VALID rows (masked rows carry zeros or
        # untrusted content; they sort last regardless of their assignment).
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
        # Order clusters by their dominant class (then cluster id): rows
        # of a cluster stay contiguous (routing unchanged) while tiles'
        # class spans narrow wherever clusters are class-pure —
        # window="keep" below turns that into the class-windowed
        # aggregation path. Memory-safe dominant class: np.unique over
        # (cluster, class) pair codes + ascending-count stable writes
        # (the last write per cluster is its argmax class).
        pairs, cnt = np.unique(
            assign[mask_np] * np.int64(n_classes) + sy_np[mask_np],
            return_counts=True,
        )
        bycnt = np.argsort(cnt, kind="stable")
        dom = np.zeros(k + 1, np.int64)
        dom[pairs[bycnt] // n_classes] = pairs[bycnt] % n_classes
        dom[k] = n_classes  # the masked-row sentinel cluster sorts last
        perm = np.argsort(
            dom[assign] * np.int64(k + 1) + assign, kind="stable"
        )

    if np.array_equal(perm, np.arange(S, dtype=perm.dtype)):
        # Already in the target order (e.g. chunk builders that generate
        # class-sorted rows): skip the device-side gathers — at bank
        # scale each one is a full-bank copy (2 GB at 1M x 512 f32),
        # which is what OOM'd the first 8M giant-ivf build.
        sfeat_s, sy_s, mask_s = (
            jnp.asarray(sfeat), jnp.asarray(sy), jnp.asarray(support_mask)
        )
    else:
        sfeat_s = jnp.asarray(sfeat)[perm]
        sy_s = jnp.asarray(sy)[perm]
        mask_s = jnp.asarray(support_mask)[perm]
    prep = prepare_support(
        sfeat_s, sy_s, n_classes, kernel=kernel, precision=precision,
        support_mask=mask_s, block_s=block_s, window="keep",
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


def concat_ivf(ivfs, n_classes: int) -> IVFPrepared:
    """Concatenate IVF banks into one larger routable bank, O(bytes).

    The routing index is per-tile, so banks concatenate exactly like
    ``concat_prepared`` plus a centroid-array stack — this is how banks
    beyond the f32-materialization ceiling get routing: build each chunk
    with ``prepare_support_ivf`` (each chunk is class/cluster-sorted
    internally, so its tiles are spatially coherent) and concat. A class
    split across chunks simply owns tiles in several chunks; routing
    ranks all of them globally, so recall is unaffected — the only cost
    is up to one extra partially-filled tile per chunk per class.
    """
    ivfs = list(ivfs)
    if not ivfs:
        raise ValueError("concat_ivf needs at least one bank")
    if len(ivfs) == 1:
        return ivfs[0]
    from .pallas_nw import concat_prepared

    d_pad = ivfs[0].cents.shape[1]
    for v in ivfs[1:]:
        if v.cents.shape[1] != d_pad:
            raise ValueError(
                f"routing width mismatch: {v.cents.shape[1]} vs {d_pad}"
            )
    prep = concat_prepared([v.prep for v in ivfs], n_classes)
    return IVFPrepared(
        prep=prep,
        cents=jnp.concatenate([v.cents for v in ivfs], axis=0),
        c2=jnp.concatenate([v.c2 for v in ivfs]),
        cvalid=jnp.concatenate([v.cvalid for v in ivfs]),
    )


def _dedup_rows(ids: jnp.ndarray, n_tiles: int, n_sel: int) -> jnp.ndarray:
    """Row-wise sort + dedup of tile ids to a fixed width.

    ids: (G, k) int32. Returns (G, n_sel) int32 — each row's unique ids
    ascending, ``-1``-padded. Jit-friendly: two sorts, no scatter."""
    srt = jnp.sort(ids, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((srt.shape[0], 1), bool), srt[:, 1:] == srt[:, :-1]],
        axis=1,
    )
    uniq = jnp.sort(jnp.where(dup, n_tiles, srt), axis=1)[:, :n_sel]
    return jnp.where(uniq >= n_tiles, -1, uniq).astype(jnp.int32)


def select_tiles(affinity: jnp.ndarray, n_probe: int) -> jnp.ndarray:
    """Per-query top-``n_probe`` tiles -> fixed-size batch union.

    affinity: (B, n_tiles). Returns (n_sel,) int32 — unique selected tile
    ids in ascending order, ``-1``-padded; ``n_sel = min(B * n_probe,
    n_tiles)`` (the union can never be larger, so no valid id is ever
    dropped). Jit-friendly: static shapes, one top_k + two sorts."""
    B, n_tiles = affinity.shape
    n_probe = min(n_probe, n_tiles)
    _, ids = jax.lax.top_k(affinity, n_probe)
    n_sel = min(B * n_probe, n_tiles)
    return _dedup_rows(ids.reshape(1, -1), n_tiles, n_sel)[0]


def _route_affinity(qn: jnp.ndarray, ivf: IVFPrepared, mode: str):
    """(B, n_tiles) routing affinity. For l2-kernels ranking uses
    ``2 q.c - |c|^2`` (monotone in ``-|q - c|^2``); dot-family kernels
    rank by the dot itself. Empty tiles are never selectable (-inf)."""
    d_pad = ivf.cents.shape[1]
    qf = qn.astype(jnp.float32)
    qf = jnp.pad(qf, ((0, 0), (0, d_pad - qf.shape[1])))
    aff = qf @ ivf.cents.T
    if mode == "l2":
        aff = 2.0 * aff - ivf.c2[None, :]
    return jnp.where(ivf.cvalid[None, :] > 0, aff, -jnp.inf)


def route_tiles(
    qn: jnp.ndarray,
    ivf: IVFPrepared,
    n_probe: int,
    *,
    mode: str,
) -> jnp.ndarray:
    """Tile selection for a (normalized) query batch: one matmul against
    the tile centroids + ``select_tiles``."""
    return select_tiles(_route_affinity(qn, ivf, mode), n_probe)


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
    group_b: Optional[int] = None,
    **prepared_kwargs: Any,
) -> jnp.ndarray:
    """IVF-pruned NW log-probs: route, then stream only the selected
    tiles through the prepared serving kernel. Fully jittable with
    ``ivf`` as a jit argument (the 413 lesson — never close over banks).

    ``n_probe`` is the recall knob: tiles per query before the union.

    ``group_b=None`` (default): ONE tile union for the whole batch — the
    right shape when the batch's queries share routing (skewed serving
    traffic), but a diverse batch's union approaches the whole bank and
    every query pays compute over all of it. ``group_b=g``: the batch is
    ROUTE-SORTED (by each query's best tile) and split into blocks of
    ``g``; each block gets its OWN union inside one kernel call (2-D
    ``tile_sel``), so total cost is the sum of small per-group unions —
    the uniform-batch fix. Outputs are restored to input order. Per-query
    results depend only on which tiles its group streams (a superset of
    its own ``n_probe`` picks), so recall can only improve over the
    per-query route; agreement gates are measured in scripts/ivf_lab.py.

    ``n_probe >= n_tiles`` reproduces full mode exactly in both shapes."""
    mode, _, qn, _ = _resolve_mode(
        kernel, kernel_params or {}, qfeat, qfeat[:1]
    )
    B = qfeat.shape[0]
    if group_b is None or B <= group_b:
        tsel = select_tiles(_route_affinity(qn, ivf, mode), n_probe)
        return nw_fused_from_prepared(
            qfeat, ivf.prep, n_classes, kernel=kernel,
            kernel_params=kernel_params, block_b=block_b, interpret=interpret,
            tile_sel=tsel, **prepared_kwargs,
        )

    if block_b is not None:
        # The grouped branch's query tiling IS group_b (each block of
        # group_b route-sorted queries gets its own tile union) — a
        # caller-supplied block_b cannot be honored here.
        warnings.warn(
            f"block_b={block_b} is ignored on the grouped IVF path: "
            f"group_b={group_b} defines the query tiling",
            stacklevel=2,
        )
    n_tiles = ivf.cents.shape[0]
    np_eff = min(n_probe, n_tiles)
    b_pad = _round_up(B, group_b)
    if b_pad > B:
        # Edge-repeat padding: pad queries carry a REAL query's routing,
        # so the last group's union gains nothing it didn't already have.
        rep = jnp.broadcast_to(qfeat[-1:], (b_pad - B,) + qfeat.shape[1:])
        qfeat = jnp.concatenate([qfeat, rep], axis=0)
        qn = jnp.concatenate(
            [qn, jnp.broadcast_to(qn[-1:], (b_pad - B,) + qn.shape[1:])],
            axis=0,
        )
    aff = _route_affinity(qn, ivf, mode)
    _, ids = jax.lax.top_k(aff, np_eff)          # (b_pad, np_eff)
    order = jnp.argsort(ids[:, 0])               # route-sort by best tile
    inv = jnp.argsort(order)
    n_sel = min(group_b * np_eff, n_tiles)
    tsel = _dedup_rows(
        ids[order].reshape(b_pad // group_b, group_b * np_eff),
        n_tiles, n_sel,
    )
    out = nw_fused_from_prepared(
        qfeat[order], ivf.prep, n_classes, kernel=kernel,
        kernel_params=kernel_params, block_b=group_b, interpret=interpret,
        tile_sel=tsel, **prepared_kwargs,
    )
    return out[inv][:B]


class IVFAutoConfig(NamedTuple):
    """A calibrated IVF operating point (``ivf_auto_config``)."""

    n_probe: int
    group_b: Optional[int]
    agreement: float        # measured top-1 agreement on the calib batch
    route_diversity: int    # distinct best tiles in the calib batch


def ivf_auto_config(
    qfeat: jnp.ndarray,
    ivf: IVFPrepared,
    n_classes: int,
    *,
    kernel: str = "euclidean",
    kernel_params: Optional[Dict[str, Any]] = None,
    target_agree: float = 0.999,
    probes: Tuple[int, ...] = (1, 2, 3, 4, 6, 8, 12, 16, 24, 32),
    group_b: int = 64,
    diverse_frac: float = 0.25,
    interpret: Optional[bool] = None,
) -> IVFAutoConfig:
    """Calibrate ``(n_probe, group_b)`` on a representative query batch.

    The reference's recall knob is hnswlib's ``ef`` and the user tunes it
    blind (``/root/reference/nwhead/utils.py:209-211``); here the knob is
    ``n_probe`` and this calibrates it against ground truth: one EXACT
    full-bank pass on ``qfeat`` (paid once, at calibration), then routed
    passes at increasing ``n_probe`` until top-1 agreement reaches
    ``target_agree``. Synthetic separated banks answer 1.000 at tiny
    n_probe; real overlapping feature clusters (digits, synthetic_cub —
    scripts/ivf_lab.py --real) need more probes, which is exactly what
    hand-tuning misses.

    ``group_b`` engages (grouped route-sorted unions) when the batch's
    routing is diverse: if the whole-batch union would exceed
    ``diverse_frac`` of the bank's tiles, per-group unions are the
    measured uniform-batch win (BASELINE.md round-4 table). Grouped
    routing streams a superset of each query's own picks, so agreement
    measured ungrouped is a lower bound for the grouped config.

    Returns the chosen point plus its measured agreement. Use a batch
    that looks like serving traffic — calibration is only as good as the
    sample."""
    exact = nw_fused_from_prepared(
        qfeat, ivf.prep, n_classes, kernel=kernel,
        kernel_params=kernel_params, interpret=interpret,
    )
    ref_top1 = np.asarray(exact).argmax(1)
    mode, _, qn, _ = _resolve_mode(
        kernel, kernel_params or {}, qfeat, qfeat[:1]
    )
    aff = _route_affinity(qn, ivf, mode)
    best = np.asarray(jnp.argmax(aff, axis=1))
    diversity = int(np.unique(best).size)
    n_tiles = int(ivf.cents.shape[0])
    B = int(qfeat.shape[0])

    chosen = None
    for p in probes:
        if p >= n_tiles:
            break
        union_est = min(B * p, n_tiles)  # worst-case whole-batch union
        g = group_b if (
            B > group_b and union_est > diverse_frac * n_tiles
        ) else None
        out = nw_fused_ivf_log_probs(
            qfeat, ivf, n_classes, kernel=kernel,
            kernel_params=kernel_params, n_probe=p, group_b=g,
            interpret=interpret,
        )
        agree = float((np.asarray(out).argmax(1) == ref_top1).mean())
        chosen = IVFAutoConfig(p, g, agree, diversity)
        if agree >= target_agree:
            return chosen
    # Nothing met the target (or the bank has fewer tiles than the first
    # probe): serve exact-equivalent routing.
    return IVFAutoConfig(
        n_tiles,
        chosen.group_b if chosen is not None else None,
        1.0,
        diversity,
    )
