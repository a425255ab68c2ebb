"""Support-sharded NW inference: the framework's distributed backend.

The NW op's scaling axis is the support size S (the sequence-length analog,
SURVEY.md §2.5). Full-mode inference with a pod-scale bank shards the
support features over the ``support`` mesh axis; each device computes
online-softmax partial statistics (running max m, normalizer l, weighted
label-sum acc) over its local shard, and one tiny collective combines them:

    m* = pmax(m)                     -- (B, 1) per query
    l* = psum(l · exp(m - m*))       -- renormalized normalizers
    acc* = psum(acc · exp(m - m*))   -- renormalized label sums
    probs = acc* / l*

This is mathematically exact (softmax-weighted label averaging is
associative under online-softmax renormalization) — the collective payload
is (B, C+2) per device regardless of S, so S scales with pod HBM while ICI
traffic stays constant. The reference has no distributed path at all
(single GPU, ``train.py:128-133``); its closest ancestor is the host-side
streaming loop ``legacy/model/net.py:53-72``.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nwhead_tpu.ops.nw import LOG_FLOOR
from nwhead_tpu.ops.kernels import get_kernel

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def nw_partials(
    qfeat: jnp.ndarray,
    sfeat: jnp.ndarray,
    sy: jnp.ndarray,
    mask: jnp.ndarray,
    n_classes: int,
    *,
    kernel: str = "euclidean",
    kernel_params: Optional[Dict[str, Any]] = None,
    use_fused: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-shard online-softmax partials for a local support shard.

    qfeat: (B, D); sfeat: (S_loc, D); sy: (S_loc,) int; mask: (S_loc,).
    Returns (m (B, 1), l (B, 1), acc (B, C)).

    use_fused: run the fused Pallas kernel per shard (default on TPU; the
    materialized jnp path elsewhere — both are exact).
    """
    if use_fused is None:
        use_fused = jax.default_backend() == "tpu"
    if use_fused:
        from nwhead_tpu.ops.pallas_nw import nw_fused_partials

        return nw_fused_partials(
            qfeat, sfeat, sy, n_classes,
            kernel=kernel, kernel_params=kernel_params, support_mask=mask,
        )
    kernel_fn, init_params = get_kernel(kernel)
    kparams = kernel_params if kernel_params is not None else init_params
    scores = kernel_fn(kparams, qfeat[:, None, :], sfeat[None])[  # (B, 1, S)
        :, 0, :
    ]
    scores = jnp.where(mask[None, :] > 0, scores, _NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)  # (B, 1)
    m_safe = jnp.where(m > _NEG_INF / 2, m, 0.0)
    p = jnp.where(scores > _NEG_INF / 2, jnp.exp(scores - m_safe), 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    onehot = jax.nn.one_hot(sy, n_classes, dtype=jnp.float32)
    acc = p @ onehot  # (B, C)
    return m, l, acc


def merge_partials(m, l, acc, axis_name: str):
    """Combine per-shard partials across the support axis (exact)."""
    m_g = jax.lax.pmax(m, axis_name)
    scale = jnp.where(m > _NEG_INF / 2, jnp.exp(m - m_g), 0.0)
    l_g = jax.lax.psum(l * scale, axis_name)
    acc_g = jax.lax.psum(acc * scale, axis_name)
    probs = acc_g / jnp.maximum(l_g, 1e-30)
    return jnp.log(probs + LOG_FLOOR)


def sharded_ensemble_predict_fn(
    mesh: Mesh,
    ens_feat: jnp.ndarray,
    ens_y: jnp.ndarray,
    ens_mask: jnp.ndarray,
    n_classes: int,
    *,
    kernel: str = "euclidean",
    kernel_params: Optional[Dict[str, Any]] = None,
    use_fused: Optional[bool] = None,
):
    """Support-sharded ensemble predict: the prob-space per-environment
    average (``nw.py:143-154``) at pod scale.

    The stacked per-env banks (E, S_pad, D) shard their SUPPORT axis over
    the 'support' mesh axis (``S_pad`` must be a multiple of the shard
    count; padding rows carry ``ens_mask == 0``). Each device scans its
    local slice of every environment, emitting online-softmax partials per
    env; one (B, C+2) pmax/psum pair per env merges them exactly — the
    same constant-ICI-payload recipe as full mode, E times. Returns a
    jitted ``qfeat (B, D) -> (B, C)`` ensemble log-probs function
    (queries sharded over 'data').
    """
    n_envs = ens_feat.shape[0]

    def local(qfeat, sf, sy, sm):
        def body(acc, xs):
            f, y, m_ = xs
            m, l, a = nw_partials(
                qfeat, f, y, m_, n_classes,
                kernel=kernel, kernel_params=kernel_params,
                use_fused=use_fused,
            )
            lp = merge_partials(m, l, a, "support")
            return acc + jnp.exp(lp), None

        init = jnp.zeros((qfeat.shape[0], n_classes), jnp.float32)
        total, _ = jax.lax.scan(body, init, (sf, sy, sm))
        # Matches the single-device ensemble exactly: each env's log-probs
        # already carry the +1e-12 floor; the mean is taken in prob space.
        return jnp.log(total / n_envs)

    mapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("data"), P(None, "support"), P(None, "support"),
                  P(None, "support")),
        out_specs=P("data"),
        # pallas_call outputs carry no varying-mesh-axes metadata (same
        # reason as the full-mode paths below).
        check_vma=False,
    )

    # The bank rides as jit ARGUMENTS — closing over it would inline it
    # as HLO constants (the remote compile service rejects big bodies;
    # CLAUDE.md 413 lesson).
    jitted = jax.jit(mapped)

    def predict(qfeat):
        return jitted(qfeat, ens_feat, ens_y, ens_mask)

    return predict


def sharded_knn_predict_fn(
    mesh: Mesh,
    feat: jnp.ndarray,
    labels: jnp.ndarray,
    mask: jnp.ndarray,
    n_classes: int,
    n_neighbors: int,
    *,
    kernel: str = "euclidean",
    kernel_params: Optional[Dict[str, Any]] = None,
):
    """Support-sharded exact-KNN predict: the reference's knn mode
    (``nwhead/utils.py:178-193`` + the 2-D support broadcast
    ``nw.py:277-289``) at pod scale, with its union-with-duplicates quirk
    preserved exactly.

    Two stages inside one shard_map, no feature gather ever crosses ICI:
      1. each device takes its local L2 top-k per query, the per-shard
         candidates all_gather over 'support' AND 'data' (the union is
         over the WHOLE batch, like the reference's flat concat), and a
         second top-k picks the true global neighbors;
      2. the union support's NW head is full-mode NW restricted to the
         union rows — with row MULTIPLICITY folded into the scores as
         ``+ln(count)`` (``c·exp(s) == exp(s + ln c)``, so a row that is
         several queries' neighbor counts several times, exactly matching
         the reference's duplicated flat support). Per-shard
         online-softmax partials then merge with the usual pmax/psum pair.

    feat (S_pad, D) / labels (S_pad,) / mask (S_pad,) are sharded
    P('support'); ``n_neighbors`` must not exceed the local shard size.
    Returns a jitted ``qfeat (B, D) -> (B, C)`` log-probs function.
    """
    from nwhead_tpu.ops.kernels import pairwise_sqdist

    kernel_fn, init_params = get_kernel(kernel)
    kparams = kernel_params if kernel_params is not None else init_params
    k = n_neighbors

    def local(qfeat, sfeat, sy, smask):
        S_loc = sfeat.shape[0]
        # Stage 1: local L2 candidates (the reference's index metric is
        # always L2 regardless of the head kernel, utils.py:187).
        d2 = pairwise_sqdist(qfeat[None], sfeat[None])[0]  # (B_loc, S_loc)
        neg = jnp.where(smask[None, :] > 0, -d2, -jnp.inf)
        cand_s, cand_i = jax.lax.top_k(neg, k)
        offset = jax.lax.axis_index("support") * S_loc
        cand_gi = cand_i + offset
        all_s = jax.lax.all_gather(cand_s, "support")  # (ns, B_loc, k)
        all_i = jax.lax.all_gather(cand_gi, "support")
        all_s = jax.lax.all_gather(all_s, "data")  # (nd, ns, B_loc, k)
        all_i = jax.lax.all_gather(all_i, "data")
        nd, ns, b_loc, _ = all_s.shape
        # Global top-k per query over its ns*k candidates (exact: top-k of
        # per-shard top-ks).
        per_q_s = all_s.transpose(0, 2, 1, 3).reshape(nd * b_loc, ns * k)
        per_q_i = all_i.transpose(0, 2, 1, 3).reshape(nd * b_loc, ns * k)
        top_s, pos = jax.lax.top_k(per_q_s, k)
        union_ids = jnp.take_along_axis(per_q_i, pos, axis=1).reshape(-1)
        # A shard with fewer than k valid rows backfills its local top-k
        # with -inf masked/padding candidates; if the GLOBAL valid count is
        # also short of k they would survive the second top-k and leak
        # masked rows into the union — drop them by score.
        union_ok = (top_s > -jnp.inf).reshape(-1)

        # Stage 2: per-row multiplicity on this shard.
        loc = union_ids - offset
        valid = (loc >= 0) & (loc < S_loc) & union_ok
        counts = jnp.zeros(S_loc, jnp.float32).at[
            jnp.clip(loc, 0, S_loc - 1)
        ].add(jnp.where(valid, 1.0, 0.0))

        scores = kernel_fn(kparams, qfeat[None], sfeat[None])[0]  # (B_loc, S_loc)
        adj = jnp.where(
            counts[None, :] > 0,
            scores + jnp.log(jnp.maximum(counts, 1.0))[None, :],
            _NEG_INF,
        )
        m = jnp.max(adj, axis=-1, keepdims=True)
        m_safe = jnp.where(m > _NEG_INF / 2, m, 0.0)
        p = jnp.where(adj > _NEG_INF / 2, jnp.exp(adj - m_safe), 0.0)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = p @ jax.nn.one_hot(sy, n_classes, dtype=jnp.float32)
        return merge_partials(m, l, acc, "support")

    mapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("data"), P("support"), P("support"), P("support")),
        out_specs=P("data"),
        check_vma=False,
    )

    jitted = jax.jit(mapped)  # bank as jit args (413-proof), not closure

    def predict(qfeat):
        return jitted(qfeat, feat, labels, mask)

    return predict


@dataclass
class ShardedSupportBank:
    """HBM-resident support bank, rows sharded over the 'support' mesh axis.

    Built once per precompute; padded to a multiple of the shard count with
    masked rows (score -inf == absent).

    Two storage modes:
      * raw (``feat/labels/mask``): per-call padding/packing inside the
        shard_mapped predict (differentiable building blocks; jnp fallback
        off-TPU);
      * prepared (``prepared`` holds per-shard ``prepare_support`` arrays
        concatenated along the shard axis): each device streams its local
        bank through the hand-rolled double-buffered DMA serving kernel and
        emits online-softmax partials — per-call HBM traffic is exactly the
        local bank bytes, at f32/bf16/int8/int4 bank precision. Raw arrays are
        dropped in this mode (the prepared bank IS the bank; keeping both
        would halve pod HBM capacity).
    """

    feat: Optional[jnp.ndarray]  # (S_pad, D), sharded P('support'); None when prepared
    labels: Optional[jnp.ndarray]  # (S_pad,), sharded P('support')
    mask: Optional[jnp.ndarray]  # (S_pad,), sharded P('support')
    mesh: Mesh
    n_classes: int
    kernel: str = "euclidean"
    prepared: Optional[Any] = None  # PreparedSupport of shard-concatenated arrays
    precision: str = "f32"
    # live input row -> global array position (host-side; supports
    # O(removed) tombstone removals — see remove_rows). None when the bank
    # was constructed without build() (e.g. dataclass literal in tests).
    rowmap: Optional[np.ndarray] = field(default=None, repr=False)
    dead: int = 0  # tombstoned rows since the bank was built
    # IVF tile-routing index over the shard-concatenated prepared tiles
    # (build(ivf=True); see ops/ivf.py): per-tile centroids in normalized
    # feature space, their self-norms, and a validity flag — all sharded
    # P('support') so each device routes against its LOCAL tiles only.
    ivf_cents: Optional[jnp.ndarray] = None  # (n_tiles_total, d_pad) f32
    ivf_c2: Optional[jnp.ndarray] = None     # (n_tiles_total,) f32
    ivf_cvalid: Optional[jnp.ndarray] = None  # (n_tiles_total,) f32 1/0

    @staticmethod
    def build(
        feats: np.ndarray,
        labels: np.ndarray,
        mesh: Mesh,
        n_classes: int,
        kernel: str = "euclidean",
        precision: str = "f32",
        use_prepared: Optional[bool] = None,
        ivf: bool = False,
    ) -> "ShardedSupportBank":
        """``ivf=True`` (prepared mode only): class-sort each shard's rows
        and attach a per-tile centroid routing index, enabling the pruned
        ``predict_fn(ivf_n_probe=...)`` path (each device routes queries
        against its LOCAL tiles and streams only the selected ones — the
        pod-scale version of ``ops.ivf``). Per-shard routing selects each
        shard's locally-best ``n_probe`` tiles, a superset of the global
        top-``n_probe`` restricted to that shard, so recall is at least
        the single-device IVF's at equal ``n_probe``. Ignored in raw
        mode (no tile structure to route over)."""
        from nwhead_tpu.ops.pallas_nw import (
            PreparedSupport, _auto_block_s, _round_up, prepare_support,
        )

        if use_prepared is None:
            # The prepared serving kernel is a TPU Pallas program; elsewhere
            # it only runs in (slow) interpret mode, so default to the jnp
            # raw path off-TPU — EXCEPT when a reduced-precision bank was
            # requested, which only the prepared path implements (interpret
            # mode is correct, just slow — fine for CPU dev/test meshes).
            use_prepared = (
                jax.default_backend() == "tpu" or precision != "f32"
            )
        if precision != "f32" and not use_prepared:
            raise ValueError(
                "bf16/int8 sharded banks require the prepared path "
                "(use_prepared=True)"
            )

        n_shards = mesh.shape["support"]
        S, D = feats.shape
        local = -(-S // n_shards)
        shard = NamedSharding(mesh, P("support"))

        if use_prepared:
            # Per-shard prepare: each shard is padded/normalized/packed
            # exactly as a single-device prepared bank of its local rows, so
            # the shard_mapped predict reconstructs a local PreparedSupport
            # by slicing the shard axis — zero per-call preparation.
            feat_p = np.zeros((local * n_shards, D), np.float32)
            feat_p[:S] = feats
            lab_p = np.zeros((local * n_shards,), np.int32)
            lab_p[:S] = labels
            mask_p = np.zeros((local * n_shards,), np.float32)
            mask_p[:S] = 1.0
            preps = []
            cents_l, c2_l, cvalid_l = [], [], []
            rowmap = np.empty(S, np.int64)
            for k in range(n_shards):
                sl = slice(k * local, (k + 1) * local)
                f_loc, l_loc, m_loc = feat_p[sl], lab_p[sl], mask_p[sl]
                if ivf:
                    # Class-sort the shard's rows on the host so each
                    # fixed bank tile sits inside one class neighborhood
                    # (tile centroids ≈ class means — the single-device
                    # order='class' layout, per shard). window='keep'
                    # computes the class windows from this order without
                    # a second sort.
                    perm = np.argsort(
                        np.where(m_loc > 0, l_loc.astype(np.int64),
                                 n_classes),
                        kind="stable",
                    )
                    f_loc, l_loc, m_loc = f_loc[perm], l_loc[perm], m_loc[perm]
                    pk, order = prepare_support(
                        jnp.asarray(f_loc), jnp.asarray(l_loc),
                        n_classes, kernel=kernel,
                        support_mask=jnp.asarray(m_loc),
                        precision=precision, window="keep",
                        return_order=True,
                    )
                    assert order is None  # 'keep' never permutes
                    order = perm
                    from nwhead_tpu.ops.ivf import _tile_centroids
                    from nwhead_tpu.ops.pallas_nw import _resolve_mode

                    fj = jnp.asarray(f_loc, jnp.float32)
                    _, _, _, sn_k = _resolve_mode(
                        kernel, {"logit_scale": jnp.float32(0.0)},
                        fj[:1], fj,
                    )
                    ck, c2k, cvk = _tile_centroids(
                        sn_k, jnp.asarray(m_loc), pk.lane.shape[0],
                        pk.lane.shape[1] * 128, _round_up(D, 128),
                    )
                    cents_l.append(np.asarray(ck))
                    c2_l.append(np.asarray(c2k))
                    cvalid_l.append(np.asarray(cvk))
                else:
                    pk, order = prepare_support(
                        jnp.asarray(f_loc), jnp.asarray(l_loc),
                        n_classes, kernel=kernel,
                        support_mask=jnp.asarray(m_loc),
                        precision=precision, return_order=True,
                    )
                preps.append(pk)
                # Input row i = k*local + r lands at global prepared
                # position k*shard_rows + inv[r] (shard_rows is uniform:
                # every shard preps the same `local` row count).
                shard_rows = pk.lane.shape[0] * pk.lane.shape[1] * 128
                n_live = max(0, min(S - k * local, local))
                if n_live:
                    if order is None:
                        inv_live = np.arange(n_live, dtype=np.int64)
                    else:
                        inv = np.empty(len(order), np.int64)
                        inv[order] = np.arange(len(order))
                        inv_live = inv[:n_live]
                    rowmap[k * local:k * local + n_live] = (
                        k * shard_rows + inv_live
                    )

            # Class-windowed aggregation across shards: the shard_mapped
            # predict runs ONE program, so the window's STATIC width (it
            # rides in win.shape) must agree on every shard —
            # concat_prepared widens each shard's window to the max width
            # with starts clamped down (spans stay covered), or drops
            # windows everywhere if any shard came back un-windowed (rows
            # stay class-sorted, which the full-width kernel is
            # indifferent to).
            from nwhead_tpu.ops.pallas_nw import concat_prepared

            merged = concat_prepared(preps, n_classes)
            prepared = PreparedSupport(*(
                None if v is None else jax.device_put(v, shard)
                for v in merged
            ))
            ivf_cents = ivf_c2 = ivf_cvalid = None
            if ivf:
                ivf_cents = jax.device_put(
                    jnp.asarray(np.concatenate(cents_l, axis=0)), shard
                )
                ivf_c2 = jax.device_put(
                    jnp.asarray(np.concatenate(c2_l)), shard
                )
                ivf_cvalid = jax.device_put(
                    jnp.asarray(np.concatenate(cvalid_l)), shard
                )
            return ShardedSupportBank(
                feat=None, labels=None, mask=None, mesh=mesh,
                n_classes=n_classes, kernel=kernel, prepared=prepared,
                precision=precision, rowmap=rowmap,
                ivf_cents=ivf_cents, ivf_c2=ivf_c2, ivf_cvalid=ivf_cvalid,
            )

        # Raw mode: pad so each LOCAL shard is already a multiple of the
        # fused kernel's tile size — the per-shard jnp.pad inside the
        # shard_mapped predict is then a no-op instead of a shard-bytes copy
        # per call.
        block = _auto_block_s(local, D, 4, _round_up(n_classes, 128))
        s_pad = _round_up(local, block) * n_shards
        feat = np.zeros((s_pad, D), np.float32)
        feat[:S] = feats
        lab = np.zeros((s_pad,), np.int32)
        lab[:S] = labels
        mask = np.zeros((s_pad,), np.float32)
        mask[:S] = 1.0
        return ShardedSupportBank(
            feat=jax.device_put(jnp.asarray(feat), shard),
            labels=jax.device_put(jnp.asarray(lab), shard),
            mask=jax.device_put(jnp.asarray(mask), shard),
            mesh=mesh,
            n_classes=n_classes,
            kernel=kernel,
            # Raw layout keeps input order (padding at the end).
            rowmap=np.arange(S, dtype=np.int64),
        )

    @property
    def capacity(self) -> int:
        """Total array rows (live + tombstoned + padding)."""
        if self.prepared is not None:
            return (
                self.prepared.lane.shape[0]
                * self.prepared.lane.shape[1] * 128
            )
        return int(self.mask.shape[0])

    def remove_rows(self, live_idx) -> "ShardedSupportBank":
        """Tombstone live rows: O(removed) device work, shapes unchanged —
        the sharded predict needs no recompile, only a re-close over the
        new arrays (``predict_fn``). ``live_idx`` indexes the bank's LIVE
        row order (the order ``build`` received). Raw mode scatters the
        validity mask; prepared mode reuses ``mask_prepared_rows`` on the
        shard-concatenated arrays (label sentinel + l2 self-norm
        sentinel). Tombstoned rows still stream through the per-shard
        serving kernels — callers should compact (rebuild) past a dead
        fraction (``NWNet.remove_support`` does at 25%). Returns a new
        bank sharing every untouched array. The IVF routing index (if
        any) is carried over UNCHANGED: tile centroids still reflect the
        tombstoned rows, which can only add harmless extra probes (dead
        rows inside a selected tile contribute exact-zero weight); the
        compaction rebuild refreshes the centroids."""
        if self.rowmap is None:
            raise ValueError(
                "this bank carries no row map (not built via build())"
            )
        live_idx = np.unique(np.asarray(live_idx, dtype=np.int64))
        if live_idx.size == 0:
            return self
        if live_idx.min() < 0 or live_idx.max() >= len(self.rowmap):
            raise IndexError(
                f"row index out of range for bank of {len(self.rowmap)}"
            )
        pos = self.rowmap[live_idx]
        keep = np.ones(len(self.rowmap), dtype=bool)
        keep[live_idx] = False
        shard = NamedSharding(self.mesh, P("support"))
        if self.prepared is not None:
            from nwhead_tpu.ops.pallas_nw import mask_prepared_rows

            masked = mask_prepared_rows(self.prepared, pos)
            # The scatter's output sharding is XLA's choice — re-pin the
            # touched fields to the support axis (untouched fields keep
            # their placement).
            prepared = masked._replace(
                lane=jax.device_put(masked.lane, shard),
                sub=jax.device_put(masked.sub, shard),
                s2c=(
                    None if masked.s2c is None
                    else jax.device_put(masked.s2c, shard)
                ),
            )
            return dataclasses.replace(
                self, prepared=prepared, rowmap=self.rowmap[keep],
                dead=self.dead + int(live_idx.size),
            )
        mask = jax.device_put(
            self.mask.at[jnp.asarray(pos)].set(0.0), shard
        )
        return dataclasses.replace(
            self, mask=mask, rowmap=self.rowmap[keep],
            dead=self.dead + int(live_idx.size),
        )

    def mapped_prepared(
        self,
        kernel_params: Optional[Dict[str, Any]] = None,
        ivf_n_probe: Optional[int] = None,
    ):
        """The UNJITTED shard_mapped prepared predict plus its operand
        field names: ``(mapped, names)`` where ``mapped(qfeat, *arrs)``
        with ``arrs = [getattr(prepared, n) for n in names] +
        [the ivf index arrays, when routing]`` returns (B, C) log-probs.
        Shared by ``predict_fn`` (live serving) and the AOT mesh exporter
        (``utils.aot.export_mesh_serving_artifact``), which needs the
        traceable fn to compose into one exported jit.

        ``ivf_n_probe``: route each query against the shard's LOCAL tile
        centroids and stream only the selected tiles (``build(ivf=True)``
        banks). The per-shard partials merge is unchanged — a shard whose
        selected tiles hold none of the query's mass contributes ~zero
        weight exactly like its masked rows would."""
        if self.prepared is None:
            raise ValueError("mapped_prepared needs a prepared sharded bank")
        if ivf_n_probe is not None and self.ivf_cents is None:
            raise ValueError(
                "ivf_n_probe needs a routing index — build the sharded "
                "bank with ivf=True"
            )
        from nwhead_tpu.ops.pallas_nw import (
            PreparedSupport, nw_fused_from_prepared,
        )

        n_classes = self.n_classes
        kernel = self.kernel
        prep = self.prepared
        # Only the fields this kernel/precision actually uses ride
        # through the shard_map (s2c: l2 modes; sscale: int8 banks).
        names = [
            n for n in ("s", "s2c", "lane", "sub", "sscale", "win")
            if getattr(prep, n) is not None
        ]
        n_extra = 0
        if ivf_n_probe is not None:
            names = names + ["ivf_cents", "ivf_c2", "ivf_cvalid"]
            n_extra = 3

        def local_prepared(qfeat, *arrs):
            kw = dict(zip(names, arrs))
            local_prep = PreparedSupport(
                s=kw["s"], s2c=kw.get("s2c"), lane=kw["lane"],
                sub=kw["sub"], sscale=kw.get("sscale"),
                win=kw.get("win"),
            )
            if ivf_n_probe is not None:
                from nwhead_tpu.ops.ivf import (
                    IVFPrepared, nw_fused_ivf_log_probs,
                )

                ivf_local = IVFPrepared(
                    prep=local_prep, cents=kw["ivf_cents"],
                    c2=kw["ivf_c2"], cvalid=kw["ivf_cvalid"],
                )
                m, l, acc = nw_fused_ivf_log_probs(
                    qfeat, ivf_local, n_classes,
                    kernel=kernel, kernel_params=kernel_params,
                    n_probe=ivf_n_probe, partials=True,
                )
            else:
                m, l, acc = nw_fused_from_prepared(
                    qfeat, local_prep, n_classes,
                    kernel=kernel, kernel_params=kernel_params,
                    partials=True,
                )
            return merge_partials(m, l, acc, "support")

        mapped = jax.shard_map(
            local_prepared,
            mesh=self.mesh,
            in_specs=(P("data"),) + (P("support"),) * len(names),
            out_specs=P("data"),
            # pallas_call outputs carry no varying-mesh-axes metadata;
            # the collective correctness is covered by the parity tests.
            check_vma=False,
        )
        return mapped, names

    def predict_fn(
        self,
        kernel_params: Optional[Dict[str, Any]] = None,
        ivf_n_probe: Optional[int] = None,
    ):
        """Jitted, shard_mapped full-mode predict: qfeat (B, D) -> (B, C)
        log-probs. Queries are sharded over 'data' and replicated over
        'support'; the bank stays put; one (B, C+2) psum rides ICI.
        ``ivf_n_probe`` switches to the routed (IVF-pruned) prepared path
        — see ``mapped_prepared``."""
        n_classes = self.n_classes
        kernel = self.kernel

        if self.prepared is not None:
            prep = self.prepared
            mapped, names = self.mapped_prepared(kernel_params, ivf_n_probe)

            jitted = jax.jit(mapped)  # bank as jit args (413-proof)

            def predict_prepared(qfeat):
                return jitted(qfeat, *[
                    getattr(prep, n) if n in prep._fields else
                    getattr(self, n)
                    for n in names
                ])

            return predict_prepared
        if ivf_n_probe is not None:
            raise ValueError(
                "ivf_n_probe needs the prepared sharded path (raw-mode "
                "banks have no tile structure to route over)"
            )

        def local(qfeat, sfeat, sy, mask):
            m, l, acc = nw_partials(
                qfeat, sfeat, sy, mask, n_classes,
                kernel=kernel, kernel_params=kernel_params,
            )
            return merge_partials(m, l, acc, "support")

        mapped = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P("data"), P("support"), P("support"), P("support")),
            out_specs=P("data"),
            # Same reason as above: the fused (Pallas) per-shard partials
            # path produces outputs without varying-mesh-axes metadata.
            check_vma=False,
        )

        jitted = jax.jit(mapped)  # bank as jit args (413-proof)

        def predict(qfeat):
            return jitted(qfeat, self.feat, self.labels, self.mask)

        return predict
