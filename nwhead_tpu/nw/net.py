"""NWNet — the top-level Nadaraya-Watson network.

Functional JAX re-design of the reference ``NWNet`` (``nwhead/nw.py:11-254``):
the neural state (featurizer + optional projection + kernel params) lives in
a Flax module (``NWModel``); the host-side orchestration (episodic sampling,
feature-bank precompute, inference-mode dispatch) lives in the plain-Python
``NWNet`` wrapper. All device work goes through a small set of jitted
functions with static shapes.

Key behaviors matched to the reference:
  * training forward concatenates query+support into ONE featurizer batch so
    BatchNorm statistics see the support (``nw.py:182-183``) and gradients
    flow through support features (the joint graph);
  * optional linear projection after the featurizer when ``proj_dim > 0``
    (``nw.py:74-79``);
  * ``precompute()`` builds the full support feature bank before eval
    (``nw.py:118-125``) — here the bank is device-resident (HBM) instead of
    CPU-offloaded (contrast ``nw.py:226``);
  * ``predict(x, mode)`` for modes random/full/cluster/ensemble/knn/hnsw,
    with ensemble averaging env probabilities in prob space
    (``nw.py:143-154``);
  * ``return_mask`` / ``isin`` semantics (``nw.py:186,208-211``);
  * ``get_neighbors`` (``nw.py:245-249``).
"""

from __future__ import annotations

import warnings
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nwhead_tpu.nw.head import NWHead
from nwhead_tpu.nw.support import SupportSetEval, SupportSetTrain
from nwhead_tpu.ops.influence import support_influence as _influence_op


class NWModel(nn.Module):
    """Featurizer (+ optional projection) + NW head, as one Flax module."""

    featurizer: nn.Module
    n_classes: int
    kernel_type: str = "euclidean"
    proj_dim: int = 0
    feat_dim: Optional[int] = None
    use_fused: bool = True
    fused_min_support: int = 1024
    head_precision: str = "f32"  # bf16/int8/int4: 2x/4x/8x less bank traffic (serving)

    def setup(self):
        if self.proj_dim > 0:
            assert self.feat_dim is not None, "Feature dimension must be specified"
            # torch nn.Linear init conventions (the reference's projection
            # is a default-init Linear, nw.py:74-79; torch's uniform init
            # has 1/3 lecun_normal's variance — matters at short budgets).
            from nwhead_tpu.nw.fc import (torch_linear_bias_init,
                                          torch_linear_kernel_init)

            self.proj = nn.Dense(
                self.proj_dim,
                kernel_init=torch_linear_kernel_init,
                bias_init=torch_linear_bias_init(self.feat_dim),
            )
        self.head = NWHead(
            n_classes=self.n_classes,
            kernel_type=self.kernel_type,
            use_fused=self.use_fused,
            fused_min_support=self.fused_min_support,
            precision=self.head_precision,
        )

    def featurize(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        f = self.featurizer(x, train=train)
        if self.proj_dim > 0:
            f = self.proj(f)
        return f

    def __call__(self, qx, sx, sy, train: bool = True):
        """Episodic training forward: joint featurizer batch, then the head.

        sx may be shared, (S, H, W, C), or per-query, (B, S, H, W, C) — the
        latter is the legacy per-batch-item support path
        (``legacy/model/net.py:34-42``); either way query+support share one
        featurizer batch (BN sees both, ``nw.py:182-183``).
        """
        batch_size = qx.shape[0]
        per_query = sx.ndim == qx.ndim + 1
        sx_flat = sx.reshape(-1, *sx.shape[-3:]) if per_query else sx
        inputs = jnp.concatenate([qx, sx_flat], axis=0)
        feats = self.featurize(inputs, train=train)
        qfeat, sfeat = feats[:batch_size], feats[batch_size:]
        if per_query:
            sfeat = sfeat.reshape(batch_size, sx.shape[1], -1)
        return self.head(qfeat, sfeat, sy)

    def predict_from_feats(self, qfeat, sfeat, sy, support_mask=None):
        return self.head(qfeat, sfeat, sy, support_mask)

    def predict_from_prepared(self, qfeat, prepared):
        return self.head.from_prepared(qfeat, prepared)

    def head_probs_and_weights(self, qfeat, sfeat, sy, support_mask=None):
        return self.head.probs_and_weights(qfeat, sfeat, sy, support_mask)

    def head_scores(self, qfeat, sfeat):
        return self.head.scores(qfeat, sfeat)


class NWNet:
    """Host-side orchestrator (the reference's top-level module surface).

    :param featurizer: a Flax backbone module (e.g. from models.load_model).
    :param n_classes: number of classes.
    :param support_dataset: object with ``.targets`` and ``gather(indices) ->
        (n, H, W, C) float images``; may be None for head-only use.
    :param env_array: integer environment per support item (IRM training).
    Other params as in the reference constructor (``nw.py:12-30``).
    """

    def __init__(
        self,
        featurizer: nn.Module,
        n_classes: int,
        support_dataset=None,
        feat_dim: Optional[int] = None,
        proj_dim: int = 0,
        kernel_type: str = "euclidean",
        train_type: str = "random",
        n_way: Optional[int] = None,
        n_shot: int = 1,
        n_shot_random: int = 1,
        n_shot_full: int = 100,
        n_shot_cluster: int = 1,
        cluster_impl: str = "device",
        n_neighbors: int = 10,
        ivf_n_probe: Union[int, str] = 32,
        ivf_n_clusters: Optional[int] = None,
        ivf_group_b: Optional[int] = None,
        env_array: Optional[Sequence[int]] = None,
        debug_mode: bool = False,
        return_mask: bool = False,
        use_fused: bool = True,
        fused_min_support: int = 1024,
        head_precision: str = "f32",
        seed: int = 0,
        precompute_batch: int = 128,
        mesh=None,
    ) -> None:
        self.n_classes = n_classes
        self.debug_mode = debug_mode
        self.return_mask = return_mask
        self.support_dataset = support_dataset
        self.precompute_batch = precompute_batch
        self.kernel_type = kernel_type
        # Optional ('data', 'support') mesh: full-mode inference then runs
        # over a support-sharded bank with the distributed online-softmax
        # merge (parallel.ShardedSupportBank).
        self.mesh = mesh
        self.sharded_bank = None
        self._sharded_predict = None
        self._sharded_knn_cache = None
        self._ivf_cache = None
        self._sharded_ensemble_cache = None
        # IVF-pruned full mode (mode='ivf'): recall knob + cluster count
        # (None = one cluster per bank tile; see ops/ivf.py).
        # ivf_n_probe='auto': the first ivf predict calibrates
        # (n_probe, group_b) against the exact head on that batch
        # (ops.ivf_auto_config) and pins the result; call calibrate_ivf()
        # to calibrate explicitly on chosen traffic.
        self.ivf_n_probe = ivf_n_probe
        self.ivf_n_clusters = ivf_n_clusters
        # Grouped routing (diverse/uniform batches): route-sort the batch
        # and give each ivf_group_b-query block its own tile union inside
        # one kernel call; None = one union for the whole batch (best for
        # skewed traffic). See ops/ivf.py nw_fused_ivf_log_probs.
        self.ivf_group_b = ivf_group_b
        self.quantized_featurizer = None  # set by quantize_featurizer()

        self.model = NWModel(
            featurizer=featurizer,
            n_classes=n_classes,
            kernel_type=kernel_type,
            proj_dim=proj_dim,
            feat_dim=feat_dim,
            use_fused=use_fused,
            fused_min_support=fused_min_support,
            head_precision=head_precision,
        )

        if support_dataset is not None:
            assert hasattr(
                support_dataset, "targets"
            ), "Support set must have .targets attribute"
            self.support_train = SupportSetTrain(
                np.asarray(support_dataset.targets),
                n_classes,
                train_type,
                n_shot,
                n_way=n_way,
                env_array=env_array,
                seed=seed,
            )
            self.support_eval = SupportSetEval(
                np.asarray(support_dataset.targets),
                n_classes,
                n_shot_random,
                n_shot_full,
                n_shot_cluster=n_shot_cluster,
                cluster_impl=cluster_impl,
                n_neighbors=n_neighbors,
                env_array=env_array,
                seed=seed,
            )

        # Jitted device functions (compiled per shape signature).
        self._apply_train = jax.jit(
            lambda variables, qx, sx, sy: self.model.apply(
                variables, qx, sx, sy, train=True, mutable=["batch_stats"]
            )
        )
        self._apply_eval = jax.jit(
            lambda variables, qx, sx, sy: self.model.apply(
                variables, qx, sx, sy, train=False
            )
        )
        self._featurize_eval = jax.jit(
            lambda variables, x: self.model.apply(
                variables, x, train=False, method=NWModel.featurize
            )
        )
        self._head_from_feats = jax.jit(
            lambda variables, qf, sf, sy: self.model.apply(
                variables, qf, sf, sy, method=NWModel.predict_from_feats
            )
        )
        # Ensemble: one compiled scan over the device-resident stacked env
        # banks (prob-space env averaging, ``nw.py:143-154``) — no per-env
        # recompiles, no per-call host->device bank uploads.
        self._ensemble_from_feats = jax.jit(self._ensemble_from_feats_impl)
        self._prepared_full = None  # set by precompute() for large banks
        # full-bank row -> prepared-row position (tombstone removals)
        self._prepared_pos = None
        self._prepared_dead = 0  # tombstoned rows since last compaction
        self._head_from_prepared = jax.jit(
            lambda variables, qf, prep: self.model.apply(
                variables, qf, prep, method=NWModel.predict_from_prepared
            )
        )

    # -- initialization ------------------------------------------------------

    def init(self, rng: jax.Array, sample_query: jnp.ndarray) -> Dict[str, Any]:
        """Initialize variables from one example query batch. If the
        featurizer was built with a pretrained checkpoint path
        (``load_model(name, pretrained=path)``), the converted torch weights
        are merged into the fresh tree here."""
        s_size = max(2, self.support_train.support_size()) if self.support_dataset is not None else 2
        sx = jnp.zeros((s_size, *sample_query.shape[1:]), sample_query.dtype)
        sy = jnp.zeros((s_size,), jnp.int32)
        variables = self.model.init(rng, sample_query, sx, sy, train=False)
        if getattr(self.model.featurizer, "pretrained_path", None):
            from nwhead_tpu.models.torch_import import merge_backbone_pretrained

            variables = merge_backbone_pretrained(variables, self.model.featurizer)
        return variables

    # -- training forward ----------------------------------------------------

    def process_support_eval(self, support_dataset, **kwargs) -> None:
        """Swap in a new eval support dataset (``nw.py:107-116``)."""
        self.support_dataset = support_dataset
        self.support_eval = SupportSetEval(
            np.asarray(support_dataset.targets), self.n_classes, **kwargs
        )
        # Everything bank-derived is stale until the next precompute().
        self._prepared_full = None
        self._prepared_pos = None
        self.sharded_bank = None
        self._sharded_predict = None
        self._sharded_knn_cache = None
        self._ivf_cache = None
        self._sharded_ensemble_cache = None

    def forward(
        self,
        variables: Dict[str, Any],
        x: jnp.ndarray,
        y: np.ndarray,
        support_data: Optional[Tuple] = None,
    ):
        """Episodic training forward (``nw.py:162-211``).

        Returns ``(log_probs, isin_mask, updated_batch_stats)``; the mask is
        always computed (the reference gates it on ``return_mask``).
        """
        if support_data is not None:
            sx, sy, _sm = support_data
        else:
            idx, sy, _sm = self.support_train.get_support(np.asarray(y))
            sx = self.support_dataset.gather(idx)

        sx = jnp.asarray(sx)
        sy_dev = jnp.asarray(np.asarray(sy), dtype=jnp.int32)
        isin = np.isin(np.asarray(y), np.asarray(sy))

        if self.debug_mode:
            print("qx shape:", x.shape)
            print("sx shape:", sx.shape)
            print("qy:", np.asarray(y))
            print("sy:", np.asarray(sy))
            print("qy in sy:", isin)
            print(f"Percent query dropped: {(1.0 - isin.mean()) * 100}%")

        (log_probs, updates) = self._apply_train(variables, jnp.asarray(x), sx, sy_dev)
        return log_probs, isin, updates["batch_stats"]

    # -- serving quantization --------------------------------------------------

    def quantize_featurizer(self, variables: Dict[str, Any], calib_images) -> None:
        """Swap the eval/serving featurizer for an int8 post-training-
        quantized one (``models/quantize.py``): BN-folded, per-channel int8
        weights, activation scales calibrated on ``calib_images``. Training
        (``forward``) keeps the float featurizer; call ``precompute`` after
        this so the support bank is built with the same quantized features
        as the queries. Serving-only — no reference equivalent (the
        reference is pure-f32 torch)."""
        from nwhead_tpu.models.quantize import quantize_featurizer as _quant

        fvars = {
            "params": variables["params"]["featurizer"],
            # BN-free backbones (ViT) carry no batch_stats collection.
            "batch_stats": variables.get("batch_stats", {}).get(
                "featurizer", {}
            ),
        }
        q = _quant(self.model.featurizer, fvars, jnp.asarray(calib_images))
        proj = (
            variables["params"]["proj"] if self.model.proj_dim > 0 else None
        )

        # Every quantized featurizer family (ResNet/DenseNet/ViT) has an
        # internally-jitted apply with its weights as jit ARGUMENTS;
        # wrapping it in another jit would close over them and inline
        # the folded constants into the HLO (the axon remote-compile
        # service rejects such bodies past ~resnet152/ViT-B scale). The
        # tiny projection rides its own jit.
        projfn = jax.jit(lambda k, b, f: f @ k + b)

        def feat(_variables, x):
            f = q.apply(x)
            if proj is not None:
                f = projfn(proj["kernel"], proj["bias"], f)
            return f

        self.quantized_featurizer = q
        # The quantized tree bakes in THESE weights; a later checkpoint
        # reload would silently diverge from the head params — hold the
        # source tree (identity fast path per request) and fingerprint its
        # content so an equal-content rebuilt tree is legitimately fine
        # while different weights fail loudly.
        self._quantized_from = variables
        self._quantized_variables_fp = self._variables_fingerprint(variables)
        self._featurize_eval = feat
        # Bank features must come from the same featurizer as queries.
        self._prepared_full = None
        self._prepared_pos = None
        self.sharded_bank = None
        self._sharded_predict = None
        self._sharded_knn_cache = None
        self._ivf_cache = None
        self._sharded_ensemble_cache = None

    def fuse_featurizer(self, variables: Dict[str, Any]) -> None:
        """Swap the eval/serving featurizer for the bf16 fused-serving
        graph (``models/serving_vit.py``): one Pallas kernel per ViT
        half-block with LayerNorm/LayerScale/residual folded. No
        calibration (same math as the flax bf16 eval forward). ViT only;
        for CNNs use ``quantize_featurizer`` or the flax bf16 path.
        Serving-only, like ``quantize_featurizer``."""
        from nwhead_tpu.models.serving_vit import fuse_vit_serving
        from nwhead_tpu.models.vit import VisionTransformer

        if not isinstance(self.model.featurizer, VisionTransformer):
            raise NotImplementedError(
                "fuse_featurizer is the ViT bf16 fused-serving path; for "
                "CNN backbones use quantize_featurizer (int8) or "
                "dtype=bfloat16 on the flax model"
            )
        fvars = {"params": variables["params"]["featurizer"]}
        s = fuse_vit_serving(self.model.featurizer, fvars)
        proj = (
            variables["params"]["proj"] if self.model.proj_dim > 0 else None
        )
        projfn = jax.jit(lambda k, b, f: f @ k + b)

        def feat(_variables, x):
            f = s.apply(x)  # internally jitted, weights as jit args
            if proj is not None:
                f = projfn(proj["kernel"], proj["bias"], f)
            return f

        # Rides the same stale-weights guard and bank invalidation as the
        # quantized path (the fused weights are baked in the same way).
        self.quantized_featurizer = s
        self._quantized_from = variables  # strong ref: identity fast path
        self._quantized_variables_fp = self._variables_fingerprint(variables)
        self._featurize_eval = feat
        self._prepared_full = None
        self._prepared_pos = None
        self.sharded_bank = None
        self._sharded_predict = None
        self._sharded_knn_cache = None
        self._ivf_cache = None
        self._sharded_ensemble_cache = None

    @staticmethod
    def _variables_fingerprint(variables):
        """Content fingerprint of a variables tree: per-leaf (shape,
        dtype, sum) over the smallest AND largest leaves — small leaves
        (LN biases, logit_scale) catch head/scale edits, the big backbone
        kernels catch a swapped checkpoint that froze its small params.
        Only computed on the slow path (a rebuilt tree); the serving loop
        hits the identity fast path and never pays the device readbacks."""
        leaves = jax.tree_util.tree_leaves(variables)
        by_size = sorted(leaves, key=lambda l: getattr(l, "size", 0))
        picked = {id(l): l for l in by_size[:4] + by_size[-4:]}
        return tuple(
            (tuple(l.shape), str(l.dtype), float(jnp.sum(l)))
            for l in picked.values()
        )

    def _check_quantized_variables(self, variables) -> None:
        if self.quantized_featurizer is None:
            return
        # Fast path: the very tree quantize_featurizer saw (a strong ref is
        # held, so the id cannot be recycled). Serving loops take this
        # branch — zero device work. The content fingerprint runs only for
        # a REBUILT tree, where its ~8 reduction+readback round trips
        # (~30 ms each over the tunnel) are a one-off, not per-request.
        if variables is self._quantized_from:
            return
        if self._variables_fingerprint(variables) != self._quantized_variables_fp:
            raise RuntimeError(
                "the featurizer was quantized from a different variables "
                "tree than the one passed now — the quantized weights are "
                "baked in at quantize_featurizer() time; re-run "
                "quantize_featurizer(new_variables, calib) after loading "
                "new weights"
            )
        # Equal-content rebuilt tree: adopt it so subsequent calls fast-path.
        self._quantized_from = variables

    # -- precompute ----------------------------------------------------------

    def precompute(self, variables: Dict[str, Any]) -> None:
        """Build the device-resident support feature bank + eval artifacts
        (``nw.py:118-125``). Batched, fixed-shape featurizer calls."""
        self._check_quantized_variables(variables)
        feats_env: List[np.ndarray] = []
        y_env: List[np.ndarray] = []
        meta_env: List[np.ndarray] = []
        for e, bank_idx in zip(
            self.support_eval.envs.env_ids, self.support_eval.full_bank_indices
        ):
            feats = self._featurize_bank(variables, bank_idx)
            feats_env.append(feats)
            y_env.append(self.support_eval.envs.targets[bank_idx])
            meta_env.append(np.full(len(bank_idx), e))

        full_feat = np.concatenate(feats_env, axis=0)
        full_y = np.concatenate(y_env, axis=0)
        full_meta = np.concatenate(meta_env, axis=0)
        self.support_eval.build_infer_iters(
            full_feat, full_y, full_meta, feats_env, y_env, meta_env,
            # Mesh nets keep the full bank HOST-side: steady-state device
            # HBM holds only the sharded copies (clusters build from a
            # transient device copy; exact-KNN fallback searches on host).
            device_bank=self.mesh is None,
        )
        self._build_serving_banks(variables)

    def _build_serving_banks(
        self, variables: Dict[str, Any], new_rows=None, keep_prepared=None,
        keep_sharded=None,
    ) -> None:
        """(Re)build the device bank views + prepared/sharded serving banks
        from the eval engine's cached features. Shared by ``precompute()``
        and the incremental ``add_support``/``remove_support`` paths.

        ``new_rows=(feats, labels, rows_idx)`` (``add_support`` fast path):
        when a prepared full-mode bank already exists, only the new rows
        are prepared (padded to the bank's tile size) and concatenated onto
        it — O(new) prep + one device copy instead of re-padding/
        re-sorting/re-quantizing the whole bank. ``rows_idx`` gives the new
        rows' positions in the NEW full-bank order (env insertion may be
        mid-bank), so the row->prepared-position map stays consistent.
        Falls back to a full rebuild when the concat would drop the
        class-window optimization (C > 128 banks whose new rows span too
        many classes).

        ``keep_prepared=(prep, pos, dead)`` (``remove_support`` fast path):
        install an already-tombstoned prepared bank + its updated row map
        instead of re-preparing — O(removed) device work.

        ``keep_sharded`` (mesh ``remove_support`` fast path): install an
        already-tombstoned ShardedSupportBank instead of rebuilding the
        per-shard banks; the shard_mapped predict re-closes over the new
        arrays (same shapes — no recompile)."""
        # NWNet's bank views alias the eval engine's arrays (one copy of
        # the bank, not two) — device-resident meshless, HOST numpy under
        # a mesh (only the shards live in HBM then).
        self.full_feat = self.support_eval.full_feat
        self.full_y = self.support_eval.full_y
        full_y_np = np.asarray(self.full_y)
        prev_prep = self._prepared_full
        prev_pos = self._prepared_pos
        # Prepared serving bank: pad/normalize/pack ONCE, so every full-mode
        # predict streams exactly the bank bytes (the raw path re-pads per
        # call). Skipped when a mesh is attached — the sharded branch always
        # shadows it and the extra bank-sized copy would defeat sharding's
        # memory purpose.
        self._prepared_full = None
        self._prepared_pos = None
        # Drop the mode caches NOW — they pin whole retired banks in HBM
        # until their mode happens to be called again otherwise.
        self._sharded_knn_cache = None
        prev_ivf = self._ivf_cache
        self._ivf_cache = None
        self._sharded_ensemble_cache = None
        if (
            new_rows is not None and prev_ivf is not None
            and len(prev_ivf) == 3 and self.mesh is None
        ):
            # O(new) IVF growth: prepare ONLY the new rows as one routable
            # chunk (padded with masked rows to the live bank's tile size
            # so concat_ivf's block_s check passes) and stack tiles +
            # centroids. Row order inside an IVF bank is opaque to the
            # routed head, so env-mid-bank insertion positions don't
            # matter here. Any incompatibility (kernel/width/precision
            # drift) falls back to the full rebuild on next ivf use.
            try:
                from nwhead_tpu.ops import concat_ivf, prepare_support_ivf

                nf, nl, _ = new_rows
                old = prev_ivf[1]
                blk = old.prep.lane.shape[1] * 128
                nf = np.asarray(nf, np.float32)
                n_new = nf.shape[0]
                pad = (-n_new) % blk
                nf_p = np.zeros((n_new + pad, nf.shape[1]), np.float32)
                nf_p[:n_new] = nf
                nl_p = np.zeros((n_new + pad,), np.int32)
                nl_p[:n_new] = np.asarray(nl)
                m_p = np.zeros((n_new + pad,), np.float32)
                m_p[:n_new] = 1.0
                inc = prepare_support_ivf(
                    jnp.asarray(nf_p), jnp.asarray(nl_p),
                    self.n_classes, kernel=self.kernel_type,
                    precision=self.model.head_precision,
                    support_mask=jnp.asarray(m_p), block_s=blk,
                )
                self._ivf_cache = (
                    self.full_feat,
                    concat_ivf([old, inc], self.n_classes),
                    None,
                )
            except ValueError:
                self._ivf_cache = None
        if (
            self.mesh is None
            and self.model.use_fused
            and len(full_y_np) >= self.model.fused_min_support
            and self.kernel_type in (
                "euclidean", "hypersphere_euclidean", "cosine",
                "dotproduct", "clip",
            )
        ):
            from nwhead_tpu.ops.pallas_nw import (
                concat_prepared, prepare_for_concat, prepare_support,
            )

            if keep_prepared is not None:
                (
                    self._prepared_full,
                    self._prepared_pos,
                    self._prepared_dead,
                ) = keep_prepared
            elif prev_prep is not None and new_rows is not None:
                nf, nl, rows_idx = new_rows
                inc, inc_order = prepare_for_concat(
                    jnp.asarray(nf), jnp.asarray(nl), self.n_classes,
                    prev_prep, kernel=self.kernel_type,
                    precision=self.model.head_precision,
                    return_order=True,
                )
                cand = concat_prepared([prev_prep, inc], self.n_classes)
                # Keep the incremental result unless it lost the class
                # windows the old bank had (full-width aggregation would
                # slow EVERY tile at C > 128 — a one-off O(S) rebuild
                # re-sorts the grown bank and restores them).
                if prev_prep.win is None or cand.win is not None:
                    self._prepared_full = cand
                    if prev_pos is not None:
                        n_new = len(np.asarray(nl))
                        base = prev_prep.lane.shape[0] * \
                            prev_prep.lane.shape[1] * 128
                        if inc_order is None:
                            inv_new = np.arange(n_new, dtype=np.int64)
                        else:
                            inv = np.empty(len(inc_order), np.int64)
                            inv[inc_order] = np.arange(len(inc_order))
                            inv_new = inv[:n_new]
                        pos = np.empty(len(full_y_np), np.int64)
                        newmask = np.zeros(len(full_y_np), bool)
                        newmask[np.asarray(rows_idx, np.int64)] = True
                        # Old rows keep their relative order (env segments
                        # stay in first-appearance order) AND their
                        # prepared positions; the k-th new row sits at the
                        # k-th new slot (extend appends in input order).
                        pos[~newmask] = prev_pos
                        pos[newmask] = base + inv_new
                        self._prepared_pos = pos
            if self._prepared_full is None:
                self._prepared_full, order = prepare_support(
                    self.full_feat, self.full_y, self.n_classes,
                    kernel=self.kernel_type,
                    precision=self.model.head_precision,
                    return_order=True,
                )
                S = len(full_y_np)
                if order is None:
                    self._prepared_pos = np.arange(S, dtype=np.int64)
                else:
                    inv = np.empty(S, np.int64)
                    inv[order] = np.arange(S, dtype=np.int64)
                    self._prepared_pos = inv
                self._prepared_dead = 0
        if self.mesh is not None:
            from nwhead_tpu.parallel import ShardedSupportBank

            # Per-shard prepared banks (double-buffered serving kernel +
            # partials merge) when the kernel supports it; the head's
            # precision knob (f32/bf16/int8/int4) applies to the sharded bank too.
            fused_ok = self.model.use_fused and self.kernel_type in (
                "euclidean", "hypersphere_euclidean", "cosine",
                "dotproduct", "clip",
            )
            self.sharded_bank = keep_sharded if keep_sharded is not None \
                else ShardedSupportBank.build(
                    np.asarray(self.full_feat), full_y_np, self.mesh,
                    self.n_classes,
                    kernel=self.kernel_type,
                    precision=self.model.head_precision if fused_ok
                    else "f32",
                    use_prepared=None if fused_ok else False,
                    # Attach the per-shard tile-routing index whenever the
                    # prepared path is in play: build cost is one argsort
                    # + tiny centroid arrays per shard, and mode='ivf'
                    # then works out of the box under a mesh.
                    ivf=fused_ok,
                )
            # Trained kernel params (clip's logit_scale) ride along.
            self._sharded_predict = self.sharded_bank.predict_fn(
                kernel_params=self._head_kernel_params(variables)
            )

    # -- incremental bank updates (serving-time; beyond the reference) -------

    def add_support(
        self, variables: Dict[str, Any], images, labels, env_id: int = 0
    ) -> None:
        """Incrementally extend the precomputed eval/serving bank with new
        items — new examples, or entirely new classes (< ``n_classes``),
        arriving at serve time. Only the new images run through the
        featurizer; every serving artifact (prepared bank, sharded bank,
        clusters, random sampler, KNN) is refreshed from cached features,
        and the HNSW graph grows by online insertion (no rebuild). Serving
        callables from ``make_serving_fn`` pick up the new bank on their
        next call (one recompile for the new bank shape). Training-side
        sampling (``support_train``) is untouched. The reference has no
        incremental path — any support edit means a full ``precompute()``
        re-featurizing the whole bank (``nw.py:118-125``)."""
        self._check_quantized_variables(variables)
        labels = np.asarray(labels, dtype=np.int64)
        if labels.size == 0:
            return
        if labels.min() < 0 or labels.max() >= self.n_classes:
            raise ValueError(
                f"labels must lie in [0, {self.n_classes}); got "
                f"[{labels.min()}, {labels.max()}]"
            )
        feats = self._featurize_array(variables, np.asarray(images))
        self.support_eval.extend_bank(feats, labels, env_id=env_id)
        # New rows land at the END of their env's segment — mid-bank when
        # other envs follow. Recover their positions from the refreshed
        # meta (extend appends in input order, so the tail of the env's
        # index set IS the new rows, in order).
        rows_idx = np.where(
            np.asarray(self.support_eval.full_meta) == env_id
        )[0][-len(labels):]
        self._build_serving_banks(
            variables, new_rows=(feats, labels, rows_idx)
        )

    # Tombstoned fraction of the prepared bank that triggers compaction (a
    # full re-prepare): dead rows still stream through the serving DMA, so
    # past this point the O(S) rebuild pays for itself.
    _COMPACT_DEAD_FRAC = 0.25

    def remove_support(self, variables: Dict[str, Any], indices) -> None:
        """Drop support items (indices into the current full-bank row
        order, e.g. from ``get_neighbors``/``support_influence``) and
        refresh the serving artifacts from the remaining cached features —
        nothing is re-featurized. HNSW is rebuilt (the graph has no
        deletion).

        Prepared-bank fast path: removed rows are TOMBSTONED in the live
        prepared bank (compact label -> -1 sentinel, l2 self-norm -> the
        mask sentinel) — O(removed) device work, numerically identical to
        a rebuild (masked rows contribute exact 0 weight). Dead rows still
        stream through the serving DMA, so once they exceed 25% of the
        bank the removal compacts (one full re-prepare) instead."""
        self._check_quantized_variables(variables)
        idx = np.unique(np.asarray(indices, dtype=np.int64))
        prep, pos = self._prepared_full, self._prepared_pos
        bank = self.sharded_bank
        n_before = (
            len(self.support_eval._full_y_np)
            if hasattr(self.support_eval, "_full_y_np") else 0
        )
        # Validates + compacts the eval-engine artifacts first (raises on
        # bad indices before we touch the prepared bank).
        self.support_eval.remove_bank_items(idx)
        if (
            self.mesh is not None
            and bank is not None
            and bank.rowmap is not None
            and len(bank.rowmap) == n_before
        ):
            dead = bank.dead + int(idx.size)
            if dead <= self._COMPACT_DEAD_FRAC * bank.capacity:
                self._build_serving_banks(
                    variables, keep_sharded=bank.remove_rows(idx)
                )
                return
        if prep is not None and pos is not None and len(pos) == n_before:
            from nwhead_tpu.ops.pallas_nw import mask_prepared_rows

            dead = self._prepared_dead + int(idx.size)
            s_rows = prep.lane.shape[0] * prep.lane.shape[1] * 128
            if dead <= self._COMPACT_DEAD_FRAC * s_rows:
                masked = mask_prepared_rows(prep, pos[idx])
                keep = np.ones(n_before, dtype=bool)
                keep[idx] = False
                self._build_serving_banks(
                    variables, keep_prepared=(masked, pos[keep], dead)
                )
                return
        self._build_serving_banks(variables)

    def restore_bank(
        self, variables: Dict[str, Any], feats, labels, meta=None
    ) -> None:
        """Install an already-featurized support bank (e.g. loaded from
        ``FeatureBankCache``) in place of ``precompute()`` — no featurizer
        pass. Builds ALL eval artifacts and the prepared/sharded serving
        banks, so the fused full-mode path and ``make_serving_fn`` work
        exactly as after a fresh precompute. ``meta`` (per-item env ids)
        defaults to a single environment.

        Row-order contract: features must be in canonical precompute order
        (``FeatureBankCache`` saves them that way) — row -> dataset-index
        identity consumers (``serve.py --explain``) assume it."""
        self._check_quantized_variables(variables)
        feats = np.asarray(feats)
        labels = np.asarray(labels)
        meta = (
            np.zeros(len(labels), dtype=np.int64) if meta is None else np.asarray(meta)
        )
        if not (len(feats) == len(labels) == len(meta)):
            raise ValueError(
                f"bank size mismatch: {len(feats)} feats, {len(labels)} labels, "
                f"{len(meta)} meta"
            )
        # Group per environment, first-appearance order (matches the
        # env-contiguous layout precompute produces).
        env_order = list(dict.fromkeys(int(e) for e in meta))
        feats_env, y_env, meta_env = [], [], []
        for e in env_order or [0]:
            sel = meta == e
            feats_env.append(feats[sel])
            y_env.append(labels[sel])
            meta_env.append(meta[sel])
        self.support_eval.build_infer_iters(
            np.concatenate(feats_env) if feats_env else feats,
            np.concatenate(y_env) if y_env else labels,
            np.concatenate(meta_env) if meta_env else meta,
            feats_env, y_env, meta_env,
            device_bank=self.mesh is None,
        )
        self._build_serving_banks(variables)

    def _featurize_bank(self, variables, bank_idx: np.ndarray) -> np.ndarray:
        """Batched featurizer pass over the bank, gathering images from the
        support dataset one batch at a time (the full image bank never
        materializes in host memory). In-memory transform-free datasets
        featurize from a device-resident image array instead — precompute
        runs once per epoch, and shipping the whole bank's pixels over a
        narrow host->device link every epoch made the LINK the training
        wall (~3.6 GB/epoch at the CUB recipe shape)."""
        bs = self.precompute_batch
        out = []
        if self.mesh is None:
            from nwhead_tpu.data.pipeline import device_images

            dev = device_images(self.support_dataset)
            if dev is not None:
                for start in range(0, len(bank_idx), bs):
                    idx = np.asarray(bank_idx[start:start + bs])
                    pad = bs - len(idx)
                    idxp = (
                        np.concatenate([idx, np.zeros(pad, idx.dtype)])
                        if pad else idx
                    )
                    f = self._featurize_eval(
                        variables, dev[jnp.asarray(idxp, jnp.int32)]
                    )
                    out.append(np.asarray(f[: len(idx)]))
                return np.concatenate(out, axis=0)
        for start in range(0, len(bank_idx), bs):
            imgs = np.asarray(self.support_dataset.gather(bank_idx[start : start + bs]))
            out.append(self._featurize_array(variables, imgs))
        return np.concatenate(out, axis=0)

    def _featurize_array(self, variables, imgs: np.ndarray) -> np.ndarray:
        """Batched eval featurizer over an in-memory image array — static
        shapes for jit (short batches zero-padded, padded rows discarded).
        With a mesh attached, each batch shards across ALL mesh devices
        (distributed precompute — the bank build scales with the pod
        instead of one chip)."""
        bs = self.precompute_batch
        shard = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_dev = self.mesh.devices.size
            if bs % n_dev == 0:
                shard = NamedSharding(self.mesh, P(("data", "support")))
        out = []
        for start in range(0, len(imgs), bs):
            chunk = np.asarray(imgs[start : start + bs])
            pad = bs - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, *chunk.shape[1:]), chunk.dtype)]
                )
            x = jnp.asarray(chunk)
            if shard is not None:
                x = jax.device_put(x, shard)
            f = self._featurize_eval(variables, x)
            out.append(np.asarray(f[: bs - pad]))
        return np.concatenate(out, axis=0)

    # -- inference -----------------------------------------------------------

    def make_serving_fn(
        self, variables: Dict[str, Any], normalize=None, mode: str = "full",
    ):
        """One-dispatch serving callable for the prepared full-mode path:
        a single jitted ``uint8/float batch -> log-probs`` composing
        normalize -> featurize -> prepared head.

        ``mode='ivf'`` serves through the IVF-pruned head instead
        (``ops/ivf.py``; recall knob = ``self.ivf_n_probe``): the routed
        bank rides the same single jit, and per-call DMA scales with the
        batch's routed tile union instead of the bank — measured up to
        ~16x on concentrated (serving-skew) batches at 1M rows with
        1.000 top-1 agreement (BASELINE.md). Under a mesh it composes
        the sharded per-shard-routing predict.

        ``predict`` issues separate jit calls for featurize and head (and
        callers who normalize uint8 pixels on device pay a third) — three
        dispatches per request, and XLA can never fold the normalization
        into the featurizer's first conv across jit boundaries (an extra
        (B, H, W, 3) f32 HBM round trip). Real per-request serving over a
        high-latency device link (the axon tunnel) pays each dispatch, so
        this builds ONE jitted function instead. ``normalize=(mean, std)``
        applies ``(x/255 - mean)/std`` inside the same jit (pass it when
        feeding uint8 pixels; omit for pre-normalized floats).

        The quantized featurizer path keeps its internal weights-as-jit-
        arguments structure (its ``apply`` traces inline here; weights stay
        arguments, not HLO constants — the remote-compile 413 lesson), and
        ``variables``/the prepared bank ride as arguments of the outer jit
        for the same reason.
        """
        if mode not in ("full", "ivf"):
            raise ValueError(
                f"make_serving_fn serves mode 'full' or 'ivf', got {mode!r}"
            )
        if self._prepared_full is None and self._sharded_predict is not None:
            if mode == "ivf" and (
                self.sharded_bank is None
                or self.sharded_bank.ivf_cents is None
            ):
                # Fail at build time, not at the first request.
                raise ValueError(
                    "mode='ivf' under a mesh needs the prepared sharded "
                    "bank's routing index (fused kernel on TPU, or a "
                    "reduced-precision head)"
                )
            # Mesh serving: compose the already-jitted pieces (normalize ->
            # featurize -> shard_mapped full-mode predict). A few dispatches
            # instead of one — fine on a pod, where there is no high-latency
            # tunnel between host and devices; re-tracing the (possibly
            # quantized) featurizer inside a fresh jit would risk capturing
            # its weights as HLO constants (the 413 lesson), so we don't.
            self._check_quantized_variables(variables)
            norm = None
            if normalize is not None:
                mean_ = jnp.asarray(normalize[0], jnp.float32)
                std_ = jnp.asarray(normalize[1], jnp.float32)
                norm = jax.jit(
                    lambda x: (x.astype(jnp.float32) * (1.0 / 255.0) - mean_)
                    / std_
                )
            feat_fn = self._featurize_eval

            def serve_sharded(x):
                # Read the sharded predict LIVE so bank edits
                # (add_support/remove_support) are picked up on the next
                # call, like the meshless path's live prepared-bank read —
                # and so the retired bank isn't pinned by this closure.
                sharded = self._sharded_predict
                if sharded is None:
                    raise ValueError(
                        "the sharded serving bank is gone — a bank edit or "
                        "featurizer swap invalidated it; run precompute() "
                        "and rebuild the serving fn"
                    )
                if norm is not None:
                    x = norm(x)
                qf = feat_fn(variables, x)
                if mode == "ivf":
                    # Per-shard routing over the mesh (cached/rebuilt by
                    # _ivf_predict against the live sharded bank).
                    return self._ivf_predict(variables, qf)
                return sharded(qf)

            return serve_sharded
        if mode == "ivf":
            from nwhead_tpu.ops import nw_fused_ivf_log_probs

            self._ivf_bank()  # build (or reuse) now — loud errors early
            kparams = self._head_kernel_params(variables)
            n_classes_ = self.n_classes
            kernel_ = self.kernel_type
            if self.ivf_n_probe == "auto":
                raise ValueError(
                    "ivf_n_probe='auto' is unresolved — call "
                    "calibrate_ivf(variables, x=...) on representative "
                    "traffic before make_serving_fn(mode='ivf') (the "
                    "serving closure bakes the knobs)"
                )
            n_probe = self.ivf_n_probe
            group_b_ = self.ivf_group_b

            def head(vv, f, bank):
                # select_tiles clamps n_probe to the live bank's tile
                # count, so bank growth/shrink across edits is safe.
                return nw_fused_ivf_log_probs(
                    f, bank, n_classes_, kernel=kernel_,
                    kernel_params=kparams, n_probe=n_probe,
                    group_b=group_b_,
                )

            live_bank = self._ivf_bank
        elif self._prepared_full is None:
            raise ValueError(
                "make_serving_fn needs the prepared full-mode bank — run "
                "precompute() first (prepared path is TPU-default; force "
                "with prepare_serving=True)"
            )
        else:
            head = self._head_from_prepared
            live_bank = self._live_prepared
        self._check_quantized_variables(variables)
        if normalize is not None:
            mean = jnp.asarray(normalize[0], jnp.float32)
            std = jnp.asarray(normalize[1], jnp.float32)

        def maybe_norm(x):
            if normalize is not None:
                return (x.astype(jnp.float32) * (1.0 / 255.0) - mean) / std
            return x

        q = self.quantized_featurizer
        if q is not None and hasattr(q, "split"):
            # QuantizedViT / ServingViT: their weight tree must ride as an
            # argument of THIS jit (tracing their internally-jitted apply
            # here would capture the tree as HLO constants — ViT-B bodies
            # get rejected by the remote compile service).
            statics, tree = q.split()
            fwd = q.unjitted_forward()
            proj = (
                variables["params"]["proj"]
                if self.model.proj_dim > 0
                else None
            )

            @jax.jit
            def serve_q(vv, tr, pj, prep, x):
                f = fwd(statics, tr, maybe_norm(x))
                if pj is not None:
                    f = f @ pj["kernel"] + pj["bias"]
                return head(vv, f, prep)

            # The bank is read LIVE from self so add_support/remove_support
            # updates reach existing serving callables (at worst one
            # recompile for the new bank shape).
            fn = lambda x: serve_q(variables, tree, proj, live_bank(), x)
            # AOT-export hook (utils/aot.py): the jitted composition +
            # a live getter for its non-input operands.
            fn._export_parts = (
                serve_q,
                lambda: (variables, tree, proj, live_bank()),
            )
            return fn

        feat = self._featurize_eval

        @jax.jit
        def serve(vv, prep, x):
            return head(vv, feat(vv, maybe_norm(x)), prep)

        # Live bank read — see the serve_q comment above.
        fn = lambda x: serve(variables, live_bank(), x)
        fn._export_parts = (serve, lambda: (variables, live_bank()))
        return fn

    def _live_prepared(self):
        """The current prepared bank for live serving closures; loud error
        if a later bank edit removed it (shrunk below fused_min_support,
        support swapped, featurizer re-quantized) instead of a cryptic
        NoneType trace failure inside jit."""
        p = self._prepared_full
        if p is None:
            raise ValueError(
                "the prepared serving bank no longer exists (the bank "
                "shrank below fused_min_support, the support set was "
                "swapped, or the featurizer was re-quantized) — run "
                "precompute()/restore_bank() and rebuild via make_serving_fn"
            )
        return p

    def predict(self, variables: Dict[str, Any], x: jnp.ndarray, mode: str = "random"):
        """Inference dispatch (``nw.py:127-160``). Returns log-probs, plus an
        all-True mask if ``return_mask`` (``nw.py:152,158``)."""
        self._check_quantized_variables(variables)
        qfeat = self._featurize_eval(variables, jnp.asarray(x))

        if self.debug_mode:
            print("qx shape:", x.shape)

        if mode == "full" and self.sharded_bank is not None:
            output = self._sharded_predict(qfeat)
            if self.return_mask:
                return output, np.full((len(x),), True)
            return output

        if mode == "full" and self._prepared_full is not None:
            # Serving fast path: stream the prepared bank, nothing else.
            output = self._head_from_prepared(variables, qfeat, self._prepared_full)
            if self.return_mask:
                return output, np.full((len(x),), True)
            return output

        if (
            mode == "knn"
            and self.mesh is not None
            and self.sharded_bank is not None
            and self.sharded_bank.feat is not None  # raw-mode bank only
            and self.support_eval.n_neighbors
            <= self.sharded_bank.feat.shape[0] // self.mesh.shape["support"]
            # k must not exceed the VALID row count either — single-device
            # ExactKNN errors loudly there (lax.top_k(k > S)); falling back
            # preserves that behavior instead of silently padding the
            # union with masked rows.
            and self.support_eval.n_neighbors <= len(np.asarray(self.full_y))
        ):
            # Pod-scale exact KNN: two-stage top-k + multiplicity-weighted
            # partials over the sharded bank (no single-device bank copy
            # touched). Prepared-mode banks drop raw rows; they fall back
            # to the single-device ExactKNN path below.
            output = self._knn_sharded(variables, qfeat)
            if self.return_mask:
                return output, np.full((len(x),), True)
            return output

        if mode == "ensemble" and self.mesh is not None:
            # Sharded BEFORE get_support: the single-device path's stacked
            # (E, S_max, D) bank would be materialized on one device —
            # exactly the copy sharding exists to avoid.
            output = self._ensemble_sharded(variables, qfeat)
            if self.return_mask:
                return output, np.full((len(x),), True)
            return output

        if mode == "ivf":
            # Device-side pruned full mode (ops/ivf.py): the TPU answer
            # to the reference's hnsw mode — same union-subset softmax
            # semantics, but routing is one matmul against tile centroids
            # and retrieval is pruned bank DMA, no host index.
            output = self._ivf_predict(variables, qfeat)
            if self.return_mask:
                return output, np.full((len(x),), True)
            return output

        sdata = self.support_eval.get_support(mode, x=np.asarray(qfeat))

        if mode == "ensemble":
            sfeat_env, sy_env, smask_env = sdata
            output = self._ensemble_from_feats(
                variables, qfeat, sfeat_env, sy_env, smask_env
            )
        else:
            sfeat, sy = sdata
            output = self._head_from_feats(
                variables, qfeat, jnp.asarray(sfeat), jnp.asarray(sy, dtype=jnp.int32)
            )
        if self.return_mask:
            return output, np.full((len(x),), True)
        return output

    @staticmethod
    def _head_kernel_params(variables) -> Optional[Dict[str, Any]]:
        """Trained kernel params that ride into sharded predict builders
        (today: clip's logit_scale)."""
        kparams = variables["params"].get("head", {})
        return {k: v for k, v in kparams.items() if k == "logit_scale"} or None

    def _ivf_predict(self, variables, qfeat):
        """IVF-pruned predict: build (once per bank) the cluster-sorted
        prepared bank + tile-centroid routing index from the precomputed
        full-bank features, then serve with pruned bank DMA. Cached
        against the full-bank feature object (strong ref, identity cannot
        recycle) and cleared at every bank-invalidation site alongside
        the sharded caches. The bank rides the jitted call as an ARGUMENT
        (the 413 lesson — closing over it would inline GBs of HLO
        constants)."""
        if getattr(self, "full_feat", None) is None:
            raise ValueError("mode='ivf' needs precompute() first")
        if self.mesh is not None:
            # Pod path: the sharded bank carries its own per-shard routing
            # index (build(ivf=True)); each device routes against its
            # LOCAL tiles and streams only the selected ones. No
            # single-device bank copy is ever materialized.
            bank = self.sharded_bank
            if bank is None or bank.ivf_cents is None:
                raise ValueError(
                    "mode='ivf' under a mesh needs the prepared sharded "
                    "bank with its routing index (fused kernel on TPU, or "
                    "a reduced-precision head); this bank was built "
                    "without one"
                )
            cached = self._ivf_cache
            if cached is not None and cached[0] is bank:
                return cached[1](qfeat)
            if self.ivf_n_probe == "auto":
                raise ValueError(
                    "ivf_n_probe='auto' is single-device only; under a "
                    "mesh pick it explicitly (calibrate on a single-device "
                    "build of the same bank — per-shard routed recall is a "
                    "superset of the global route)"
                )
            fn = bank.predict_fn(
                kernel_params=self._head_kernel_params(variables),
                ivf_n_probe=self.ivf_n_probe,
            )
            self._ivf_cache = (bank, fn)
            return fn(qfeat)
        cached = self._ivf_cache
        if cached is not None and cached[0] is self.full_feat and \
                cached[2] is not None:
            return cached[2](qfeat, cached[1])
        from nwhead_tpu.ops import nw_fused_ivf_log_probs

        ivf = self._ivf_bank()
        kparams = self._head_kernel_params(variables)
        if self.ivf_n_probe == "auto":
            # First-call calibration: this batch IS the traffic sample.
            self.calibrate_ivf(variables, qfeat=qfeat)
        n_probe = min(self.ivf_n_probe, ivf.prep.lane.shape[0])
        n_classes = self.n_classes
        kernel = self.kernel_type
        group_b = self.ivf_group_b

        @jax.jit
        def fn(qf, ivf_):
            return nw_fused_ivf_log_probs(
                qf, ivf_, n_classes, kernel=kernel, kernel_params=kparams,
                n_probe=n_probe, group_b=group_b,
            )

        self._ivf_cache = (self.full_feat, ivf, fn)
        return fn(qfeat, ivf)

    def calibrate_ivf(
        self,
        variables,
        x=None,
        qfeat=None,
        target_agree: float = 0.999,
        **auto_kwargs,
    ):
        """Calibrate the IVF recall knobs against ground truth on a
        traffic-representative sample (``ops.ivf_auto_config``): one exact
        full-bank pass on the sample, then routed passes at increasing
        ``n_probe`` until top-1 agreement reaches ``target_agree``. Pins
        ``self.ivf_n_probe``/``self.ivf_group_b`` and returns the chosen
        ``IVFAutoConfig`` (with its measured agreement). Pass raw images
        ``x`` (featurized with the net's featurizer) or features
        ``qfeat``. The reference's analogous knob is hnswlib's ``ef``,
        tuned blind (``/root/reference/nwhead/utils.py:209-211``)."""
        from nwhead_tpu.ops import ivf_auto_config

        if self.mesh is not None:
            raise ValueError(
                "calibrate_ivf runs on the single-device IVF bank; under "
                "a mesh pick ivf_n_probe explicitly (per-shard routed "
                "recall is a superset of the global route — a "
                "single-device calibration of the same bank is a safe "
                "starting point)"
            )
        if qfeat is None:
            if x is None:
                raise ValueError("pass x (images) or qfeat (features)")
            qfeat = self._featurize_eval(variables, jnp.asarray(x))
        if int(jnp.shape(qfeat)[0]) < 32:
            warnings.warn(
                f"calibrate_ivf on only {jnp.shape(qfeat)[0]} queries — "
                "the pinned (n_probe, group_b) is only as good as the "
                "sample; calibrate on a serving-sized representative "
                "batch",
                stacklevel=2,
            )
        # An explicitly chosen group size is the grouping CANDIDATE, not
        # a value to clobber: auto decides whether grouping engages, the
        # user decides the block size.
        if isinstance(self.ivf_group_b, int) and "group_b" not in auto_kwargs:
            auto_kwargs["group_b"] = self.ivf_group_b
        ivf = self._ivf_bank()
        cfg = ivf_auto_config(
            jnp.asarray(qfeat), ivf, self.n_classes,
            kernel=self.kernel_type,
            kernel_params=self._head_kernel_params(variables),
            target_agree=target_agree, **auto_kwargs,
        )
        self.ivf_n_probe = cfg.n_probe
        self.ivf_group_b = cfg.group_b
        # Drop only the jitted closure (it baked the old knobs); the
        # prepared bank itself is knob-independent.
        if self._ivf_cache is not None:
            self._ivf_cache = (self._ivf_cache[0], self._ivf_cache[1], None)
        return cfg

    def _ivf_bank(self):
        """The IVF-routable prepared bank for the CURRENT support features
        (meshless path) — built once per bank from the cached full-bank
        features and cached alongside the jitted predict closure
        (``_ivf_cache``, cleared at every bank-invalidation site)."""
        if getattr(self, "full_feat", None) is None:
            raise ValueError("mode='ivf' needs precompute() first")
        cached = self._ivf_cache
        if cached is not None and cached[0] is self.full_feat:
            return cached[1]
        from nwhead_tpu.ops import prepare_support_ivf

        ivf = prepare_support_ivf(
            jnp.asarray(self.full_feat),
            jnp.asarray(self.full_y, dtype=jnp.int32),
            self.n_classes,
            kernel=self.kernel_type,
            precision=self.model.head_precision,
            n_clusters=self.ivf_n_clusters,
        )
        self._ivf_cache = (self.full_feat, ivf, None)
        return ivf

    def _knn_sharded(self, variables, qfeat):
        """Sharded exact-KNN predict, cached against the sharded bank
        (strong ref — identity cannot recycle; precompute/bank edits build
        a new ShardedSupportBank and refresh the cache)."""
        cached = self._sharded_knn_cache
        if cached is not None and cached[0] is self.sharded_bank:
            return cached[1](qfeat)
        from nwhead_tpu.parallel import sharded_knn_predict_fn

        fn = sharded_knn_predict_fn(
            self.mesh,
            self.sharded_bank.feat,
            self.sharded_bank.labels,
            self.sharded_bank.mask,
            self.n_classes,
            self.support_eval.n_neighbors,
            kernel=self.kernel_type,
            kernel_params=self._head_kernel_params(variables),
        )
        self._sharded_knn_cache = (self.sharded_bank, fn)
        return fn(qfeat)

    def _ensemble_sharded(self, variables, qfeat):
        """Ensemble predict over the mesh: per-env banks shard their
        support axis; per-env online-softmax partials merge with one
        pmax/psum pair each (exact — see
        ``parallel.sharded_ensemble_predict_fn``).

        The stacked banks are built straight from the HOST-side per-env
        feature copies (``full_feat_sep`` numpy arrays) and device_put
        with the sharded layout — the single-device (E, S_max, D) stack
        the meshless path materializes never exists here, so ensemble
        capacity scales with pod HBM (mesh nets also keep the full bank
        host-side — ``build_infer_iters(device_bank=False)`` — so
        steady-state device memory holds only shards). Built lazily on
        first ensemble
        predict and cached against the sep-list identity (a strong ref, so
        identity cannot recycle; ``_install_bank`` creates a new list on
        every bank change); kernel params are captured at build time like
        the full-mode sharded path."""
        sep = self.support_eval.full_feat_sep
        cached = self._sharded_ensemble_cache
        if cached is not None and cached[0] is sep:
            return cached[1](qfeat)

        from jax.sharding import NamedSharding, PartitionSpec as P

        from nwhead_tpu.parallel import sharded_ensemble_predict_fn

        sy_sep = self.support_eval.full_y_sep
        n_shards = self.mesh.shape["support"]
        n_envs = len(sep)
        s_max = max(len(f) for f in sep)
        s_pad = -(-s_max // n_shards) * n_shards
        d = sep[0].shape[-1]
        ens_feat = np.zeros((n_envs, s_pad, d), np.float32)
        ens_y = np.zeros((n_envs, s_pad), np.int32)
        ens_mask = np.zeros((n_envs, s_pad), np.float32)
        for e, (f, y) in enumerate(zip(sep, sy_sep)):
            ens_feat[e, : len(f)] = f
            ens_y[e, : len(y)] = y
            ens_mask[e, : len(f)] = 1.0
        shard = NamedSharding(self.mesh, P(None, "support"))
        fn = sharded_ensemble_predict_fn(
            self.mesh,
            jax.device_put(jnp.asarray(ens_feat), shard),
            jax.device_put(jnp.asarray(ens_y), shard),
            jax.device_put(jnp.asarray(ens_mask), shard),
            self.n_classes,
            kernel=self.kernel_type,
            kernel_params=self._head_kernel_params(variables),
        )
        self._sharded_ensemble_cache = (sep, fn)
        return fn(qfeat)

    def _ensemble_from_feats_impl(self, variables, qfeat, sfeat_env, sy_env, smask_env):
        """Prob-space average of per-env NW heads over stacked (E, S, D)
        banks (``nw.py:143-154``), as one lax.scan — compiled once."""
        n_envs = sfeat_env.shape[0]

        def body(acc, xs):
            sf, sy, sm = xs
            lp = self.model.apply(
                variables, qfeat, sf, sy, sm, method=NWModel.predict_from_feats
            )
            return acc + jnp.exp(lp), None

        init = jnp.zeros((qfeat.shape[0], self.n_classes), jnp.float32)
        total, _ = jax.lax.scan(body, init, (sfeat_env, sy_env, smask_env))
        return jnp.log(total / n_envs)

    # -- explainability ------------------------------------------------------

    def get_neighbors(self, variables, x) -> np.ndarray:
        """Support indices sorted by similarity to x (``nw.py:245-249``)."""
        qfeat = self._featurize_eval(variables, jnp.asarray(x))
        scores = self.model.apply(
            variables, qfeat, self.full_feat, method=NWModel.head_scores
        )  # (B, 1, S)
        return np.asarray(jnp.argsort(scores[:, 0, :], axis=-1)[:, ::-1])

    def support_influence(self, variables, x, y, mode: str = "full") -> np.ndarray:
        """Leave-one-out influence of each support item on queries x
        (vectorized; the reference computes this externally via
        ``util/metric.py:23-50``)."""
        if mode == "ensemble":
            raise ValueError(
                "support_influence is per-support-set; run it per env "
                "(mode='full' after process_support_eval on one env) "
                "instead of 'ensemble'"
            )
        qfeat = self._featurize_eval(variables, jnp.asarray(x))
        sfeat, sy = self.support_eval.get_support(mode, x=np.asarray(qfeat))
        probs, weights = self.model.apply(
            variables,
            qfeat,
            jnp.asarray(sfeat),
            jnp.asarray(sy, dtype=jnp.int32),
            method=NWModel.head_probs_and_weights,
        )
        return np.asarray(
            _influence_op(probs, jnp.asarray(np.asarray(y)), weights, jnp.asarray(sy))
        )
