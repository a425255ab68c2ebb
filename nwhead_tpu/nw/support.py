"""Support-set engine: episodic sampling, balanced full banks, environments.

Host-side index math (numpy) mirroring the reference's loader-level episodic
construction, redesigned so the device side always sees static shapes:

  * ``EpisodicSampler`` — the ``InfiniteUniformClassLoader.next(qy)``
    equivalent (``nwhead/utils.py:99-140``): with ``n_way`` set, the support
    episode contains every query class plus ``n_way - |qy|`` other classes
    sampled uniformly *excluding* the query classes, ``n_shot`` examples per
    class without replacement. Support size is the constant
    ``n_way * n_shot`` (or ``n_classes * n_shot``), XLA-friendly.
  * ``balanced_full_indices`` — the ``FullDataset`` bank
    (``nwhead/utils.py:34-54``): per-class caps ``min(n_shot_full,
    min_class_count)`` (class-balanced) and takes the *first* n per class
    (deterministic).
  * ``SupportSet(Train/Eval)`` — environment handling for the three input
    shapes the reference accepts (``nwhead/support.py:19-38``) and IRM
    single-environment-per-step sampling (``support.py:76-78``).

Sampling uses ``numpy.random.Generator`` — we match the reference's
*distributional* behavior and guarantees (query classes present, class
balance, no replacement), not its bit-exact numpy legacy-RNG streams
(SURVEY.md §7 "sampler parity").
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np


def get_separated_indices(vals: Sequence[int]) -> List[List[int]]:
    """Bucket indices per label, mapping possibly non-consecutive labels to
    consecutive ids (``nwhead/utils.py:142-159``).

    E.g. [0, 1, 1, 2, 3] -> [[0], [1, 2], [3], [4]].
    """
    vals = np.asarray(vals)
    uniq = sorted(set(vals.tolist()))
    remap = {y: i for i, y in enumerate(uniq)}
    indices: List[List[int]] = [[] for _ in uniq]
    for i, c in enumerate(vals.tolist()):
        indices[remap[c]].append(i)
    return indices


def balanced_full_indices(targets: Sequence[int], n_shot_full: int) -> np.ndarray:
    """Deterministic class-balanced full-mode bank indices
    (``FullDataset``, ``nwhead/utils.py:40-48``): cap at the smallest class
    count, take the first ``n`` indices of each class."""
    per_class = get_separated_indices(targets)
    min_len = min(len(l) for l in per_class)
    n = min(n_shot_full, min_len)
    keys: List[int] = []
    for l in per_class:
        keys += l[:n]
    return np.asarray(keys, dtype=np.int64)


class EpisodicSampler:
    """Uniform-class episodic support sampler.

    Equivalent of ``InfiniteUniformClassLoader`` (``nwhead/utils.py:99-140``)
    operating purely in index space; callers gather images/features with the
    returned indices.
    """

    def __init__(
        self,
        targets: Sequence[int],
        n_shot: int,
        n_way: Optional[int] = None,
        seed: Optional[int] = None,
    ) -> None:
        self.indices = [np.asarray(l) for l in get_separated_indices(targets)]
        self.n_classes = len(self.indices)
        self.n_shot = n_shot
        self.n_way = n_way
        if n_way:
            assert n_way <= self.n_classes
        self.rng = np.random.default_rng(seed)
        # Consecutive-id remap of raw labels (for qy lookups on raw labels).
        uniq = sorted(set(np.asarray(targets).tolist()))
        self._remap = {y: i for i, y in enumerate(uniq)}
        self._label_of_class = np.asarray(uniq)
        # Inverse lookup table: class bucket of each dataset index. Built
        # once so per-episode label lookup is one vectorized gather (the
        # per-item Python loop was O(S) host work per step in full-class
        # sampling mode, sitting on the training critical path).
        total = sum(len(l) for l in self.indices)
        self._class_of_index = np.empty(total, dtype=np.int64)
        for c, l in enumerate(self.indices):
            self._class_of_index[l] = c

    def sample(self, qy: Optional[np.ndarray] = None) -> Tuple[np.ndarray, np.ndarray]:
        """Sample one support episode.

        qy: query labels of the current batch (consecutive class ids). With
        ``n_way`` set, every query class is guaranteed present in the episode
        (``utils.py:126-131``) and must satisfy ``len(qy) <= n_way``.

        Returns ``(support_indices, support_labels)``; size ``n_way * n_shot``
        (or ``n_classes * n_shot`` without n_way). The class order of the
        episode matches the reference: sampled "other" classes first, then
        the query classes.
        """
        if self.n_way:
            assert qy is not None, "n_way sampling needs the query labels"
            qy = np.asarray(qy)
            assert len(qy) <= self.n_way, "qy must be smaller than n_way"
            n_extra = self.n_way - len(qy)
            if n_extra > 0:
                probs = np.ones(self.n_classes)
                probs[qy] = 0
                total = probs.sum()
                if total == 0:
                    # Every class is already a query class (n_way ==
                    # n_classes with full coverage): fall back to uniform
                    # over all classes. (The reference divides by zero here.)
                    probs[:] = 1.0 / self.n_classes
                else:
                    probs /= total
                subclasses = self.rng.choice(
                    self.n_classes, size=n_extra, replace=False, p=probs
                )
            else:
                subclasses = np.empty(0, dtype=np.int64)
            subclasses = np.concatenate([subclasses, qy])
            class_rows = [self.indices[i] for i in subclasses]
        else:
            class_rows = self.indices

        support_idxs = np.stack(
            [self.rng.choice(row, size=self.n_shot, replace=False) for row in class_rows]
        ).flatten()
        labels = self._label_of_class[self._class_of_index[support_idxs]]
        return support_idxs, labels


@dataclass
class Environments:
    """Normalized environment info for a support dataset.

    The reference accepts three shapes (``nwhead/support.py:19-38``):
      (a) one dataset + env_array -> split per env;
      (b) a list of datasets, each its own environment (concatenated);
      (c) one dataset, no env info -> a single zero environment.
    Here a "dataset" is just its ``targets`` array; image gathering is the
    data layer's job.
    """

    targets: np.ndarray  # combined targets, len N
    env_array: np.ndarray  # env id per item, len N
    env_ids: np.ndarray  # unique env ids, sorted

    @staticmethod
    def build(
        targets_or_list,
        env_array: Optional[Sequence[int]] = None,
    ) -> "Environments":
        if env_array is not None:  # shape (a)
            targets = np.asarray(targets_or_list)
            env_array = np.asarray(env_array)
            assert len(env_array) == len(targets)
        elif isinstance(targets_or_list, (list, tuple)) and not np.isscalar(
            targets_or_list[0]
        ):  # shape (b): list of per-env target arrays
            parts = [np.asarray(t) for t in targets_or_list]
            targets = np.concatenate(parts)
            env_array = np.concatenate(
                [np.full(len(p), i, dtype=np.int64) for i, p in enumerate(parts)]
            )
        else:  # shape (c)
            targets = np.asarray(targets_or_list)
            env_array = np.zeros(len(targets), dtype=np.int64)
        return Environments(
            targets=targets,
            env_array=np.asarray(env_array),
            env_ids=np.unique(env_array),
        )

    @property
    def n_envs(self) -> int:
        return len(self.env_ids)

    def env_indices(self, env_id) -> np.ndarray:
        return np.nonzero(self.env_array == env_id)[0]


class SupportSetTrain:
    """Training-time support sampling (``nwhead/support.py:58-93``).

    train_type='random': one episodic sampler over the combined dataset,
    conditioned on the query labels.
    train_type='irm': one sampler per environment; each step draws the whole
    support from ONE uniformly chosen environment (``support.py:76-78``) —
    the invariant-representation (NeurIPS 2023) training signal.
    """

    def __init__(
        self,
        targets_or_list,
        n_classes: int,
        train_type: str = "random",
        n_shot: int = 1,
        n_way: Optional[int] = None,
        env_array: Optional[Sequence[int]] = None,
        seed: Optional[int] = None,
    ) -> None:
        self.envs = Environments.build(targets_or_list, env_array)
        self.n_classes = n_classes
        self.train_type = train_type
        self.n_shot = n_shot
        self.n_way = n_way
        self._rng = np.random.default_rng(seed)
        if train_type == "random":
            self.sampler = EpisodicSampler(
                self.envs.targets, n_shot, n_way, seed=self._seed()
            )
            self._env_samplers = None
            self._env_index_maps = None
        elif train_type == "irm":
            self._env_samplers = []
            self._env_index_maps = []
            for e in self.envs.env_ids:
                idx = self.envs.env_indices(e)
                self._env_samplers.append(
                    EpisodicSampler(self.envs.targets[idx], n_shot, seed=self._seed())
                )
                self._env_index_maps.append(idx)
            self.sampler = None
        else:
            raise ValueError(f"train_type must be 'random' or 'irm', got {train_type}")

    def _seed(self) -> int:
        return int(self._rng.integers(0, 2**31 - 1))

    def rng_state(self):
        """JSON-able snapshot of every episodic-sampling Generator (the
        env picker plus each sampler's own rng). Checkpointing this makes
        ``--resume`` continue the EXACT episode stream the uninterrupted
        run would have drawn (tested bitwise at toy scale on transform-
        free datasets; with stochastic transforms the claim stays
        distributional — their thread-local rngs are not capturable)."""
        samplers = (
            self._env_samplers if self.train_type == "irm" else [self.sampler]
        )
        return {
            "outer": self._rng.bit_generator.state,
            "samplers": [s.rng.bit_generator.state for s in samplers],
        }

    def set_rng_state(self, state) -> None:
        samplers = (
            self._env_samplers if self.train_type == "irm" else [self.sampler]
        )
        if len(state["samplers"]) != len(samplers):
            raise ValueError(
                f"sampler-state count mismatch: checkpoint has "
                f"{len(state['samplers'])}, this run has {len(samplers)}"
            )
        self._rng.bit_generator.state = state["outer"]
        for s, st in zip(samplers, state["samplers"]):
            s.rng.bit_generator.state = st

    def support_size(self) -> int:
        """Static episode size (constant across steps — XLA-friendly)."""
        if self.train_type == "irm":
            return self.n_classes * self.n_shot
        n_way = self.n_way or self.n_classes
        return n_way * self.n_shot

    def get_support(self, qy: Optional[np.ndarray] = None) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Sample one support episode -> (dataset_indices, labels, env_meta)."""
        if self.train_type == "irm":
            e = int(self._rng.integers(0, self.envs.n_envs))
            local_idx, labels = self._env_samplers[e].sample()
            idx = self._env_index_maps[e][local_idx]
            meta = np.full(len(idx), self.envs.env_ids[e])
        else:
            idx, labels = self.sampler.sample(qy)
            meta = self.envs.env_array[idx]
        return idx, labels, meta


class SupportSetEval:
    """Inference-time support artifacts (``nwhead/support.py:95-165``).

    Hold precomputed feature-bank artifacts and dispatch by mode:
    random / full / cluster / ensemble / knn / hnsw. ``build_infer_iters``
    must run after the feature bank is computed (the reference raises
    "Did you run precompute()?" otherwise, ``support.py:153-154``).
    """

    def __init__(
        self,
        targets_or_list,
        n_classes: int,
        n_shot_random: int = 1,
        n_shot_full: int = 100,
        n_shot_cluster: int = 3,
        n_neighbors: int = 20,
        env_array: Optional[Sequence[int]] = None,
        seed: Optional[int] = None,
        cluster_impl: str = "device",
    ) -> None:
        self.envs = Environments.build(targets_or_list, env_array)
        self.n_classes = n_classes
        self.n_shot_random = n_shot_random
        self.n_shot_full = n_shot_full
        self.n_shot_cluster = n_shot_cluster
        self.n_neighbors = n_neighbors
        self.seed = seed
        # "device" = batched jitted Lloyd; "sklearn" = the reference's exact
        # per-class host KMeans(random_state=0) call (bit-identical clusters).
        self.cluster_impl = cluster_impl
        # Per-env deterministic balanced banks (indices into the combined set).
        self.full_bank_indices: List[np.ndarray] = []
        for e in self.envs.env_ids:
            idx = self.envs.env_indices(e)
            local = balanced_full_indices(self.envs.targets[idx], n_shot_full)
            self.full_bank_indices.append(idx[local])

    # -- artifacts built from precomputed features ---------------------------

    def build_infer_iters(
        self,
        sfeat: np.ndarray,
        sy: np.ndarray,
        smeta: np.ndarray,
        sfeat_env: List[np.ndarray],
        sy_env: List[np.ndarray],
        smeta_env: List[np.ndarray],
        device_bank: bool = True,
    ) -> None:
        """``device_bank=False`` keeps the full bank HOST-side (numpy):
        for mesh-attached nets, steady-state device HBM then holds only
        the bank SHARDS — the artifacts that need the whole bank on device
        (cluster k-means) use a transient copy freed after the build, and
        exact-KNN searches on host."""
        self._device_bank = device_bank
        self._install_bank(sfeat, sy, smeta, sfeat_env, sy_env, smeta_env)
        # Bank rows follow the canonical precompute order (concatenated
        # ``full_bank_indices``), so row -> dataset-index identity holds.
        # Incremental edits below re-order/extend the bank and clear this.
        self.bank_is_canonical = True

    def extend_bank(self, new_feat: np.ndarray, new_y: np.ndarray, env_id: int = 0) -> None:
        """Append already-featurized items to the cached bank and refresh
        every derived artifact (clusters, samplers, KNN) from cached
        features — nothing is re-featurized. The HNSW graph is updated
        incrementally (online insertion, no rebuild). The reference has no
        incremental path: support edits require a full ``precompute()``
        (``nw.py:118-125``)."""
        if not hasattr(self, "full_feat"):
            raise AttributeError("Did you run precompute()?")
        new_feat = np.asarray(new_feat)
        new_y = np.asarray(new_y)
        if len(new_feat) != len(new_y):
            raise ValueError(f"{len(new_feat)} features vs {len(new_y)} labels")
        sfeat_env = [np.asarray(f) for f in self.full_feat_sep]
        sy_env = [np.asarray(y) for y in self.full_y_sep]
        smeta_env = [np.asarray(m) for m in self.full_meta_sep]
        env_order = [int(m[0]) if len(m) else None for m in smeta_env]
        if env_id in env_order:
            e = env_order.index(env_id)
            sfeat_env[e] = np.concatenate([sfeat_env[e], new_feat])
            sy_env[e] = np.concatenate([sy_env[e], new_y])
            smeta_env[e] = np.concatenate([smeta_env[e], np.full(len(new_y), env_id)])
        else:  # a brand-new environment
            sfeat_env.append(new_feat)
            sy_env.append(new_y)
            smeta_env.append(np.full(len(new_y), env_id))
        from nwhead_tpu.native.hnsw import HNSWIndex

        old_hnsw = getattr(self, "hnsw", None)
        reuse = isinstance(old_hnsw, HNSWIndex)
        self._install_bank(
            np.concatenate(sfeat_env),
            np.concatenate(sy_env),
            np.concatenate(smeta_env),
            sfeat_env, sy_env, smeta_env, hnsw=old_hnsw if reuse else None,
        )
        # Grow the graph only AFTER the install succeeded — a failure above
        # (e.g. OOM in the cluster rebuild) must leave the index consistent
        # with the still-installed old bank.
        if reuse:
            old_hnsw.add_items(new_feat, new_y)
        self.bank_is_canonical = False  # rows no longer map to full_bank_indices

    def remove_bank_items(self, indices) -> None:
        """Drop rows (indices into the current full-bank ordering) and
        refresh every artifact from the remaining cached features. The
        HNSW graph does not support deletion — it is rebuilt."""
        if not hasattr(self, "full_feat"):
            raise AttributeError("Did you run precompute()?")
        n = len(self._full_y_np)
        keep = np.ones(n, dtype=bool)
        idx = np.asarray(indices, dtype=np.int64)
        if idx.size and (idx.min() < 0 or idx.max() >= n):
            raise IndexError(f"indices out of range for bank of {n}")
        keep[idx] = False
        if not keep.any():
            raise ValueError(
                "cannot remove every support item — an empty bank has no "
                "valid predictions; swap the support set instead"
            )
        # Host copies of the bank already exist in the separated lists —
        # concatenating them avoids a full bank-sized device->host readback
        # (hundreds of ms over the high-latency tunnel for big banks).
        sfeat = np.concatenate([np.asarray(f) for f in self.full_feat_sep])[keep]
        sy = self._full_y_np[keep]
        smeta = self.full_meta[keep]
        # The full arrays are per-env contiguous, so regrouping by env id
        # (first-appearance order) reconstructs the separated lists; a
        # fully-emptied environment is dropped (an all-masked env row would
        # softmax over -inf only and poison ensemble mode with NaN).
        env_order = [int(m[0]) for m in self.full_meta_sep if len(m)]
        sfeat_env, sy_env, smeta_env = [], [], []
        for e in env_order:
            sel = smeta == e
            if not sel.any():
                continue
            sfeat_env.append(sfeat[sel])
            sy_env.append(sy[sel])
            smeta_env.append(smeta[sel])
        self._install_bank(sfeat, sy, smeta, sfeat_env, sy_env, smeta_env)
        self.bank_is_canonical = False  # rows no longer map to full_bank_indices

    def _install_bank(
        self,
        sfeat: np.ndarray,
        sy: np.ndarray,
        smeta: np.ndarray,
        sfeat_env: List[np.ndarray],
        sy_env: List[np.ndarray],
        smeta_env: List[np.ndarray],
        hnsw=None,
    ) -> None:
        import jax.numpy as jnp

        from nwhead_tpu.ops.kmeans import compute_clusters

        device_bank = getattr(self, "_device_bank", True)
        # The full bank is device-resident (HBM) so full-mode predict never
        # re-uploads it (the reference ships the CPU bank to device on every
        # predict call, nw.py:156,226). With device_bank=False (mesh nets)
        # it stays HOST numpy and only the sharded copies live in HBM.
        if device_bank:
            self.full_feat = jnp.asarray(sfeat)
            cluster_src = self.full_feat
        else:
            self.full_feat = np.asarray(sfeat)
            cluster_src = jnp.asarray(sfeat)  # transient: freed post-build
        self.full_y = jnp.asarray(np.asarray(sy))
        self.full_meta = np.asarray(smeta)
        self.full_feat_sep = [np.asarray(f) for f in sfeat_env]
        self.full_y_sep = [np.asarray(y) for y in sy_env]
        self.full_meta_sep = [np.asarray(m) for m in smeta_env]

        # Ensemble mode: per-env banks padded to a common length and stacked
        # DEVICE-resident, so ensemble predict is one compiled program with
        # zero per-call host->device traffic (the reference re-ships each
        # env bank per call, nw.py:143-154; padding rows are masked out).
        # Built lazily on first use — it duplicates the bank in HBM, which
        # a full-mode-only user should never pay for.
        self._ensemble_cache = None

        # Cluster: per-class k-means centroids (support.py:123).
        self.cluster_feat, self.cluster_y = compute_clusters(
            np.asarray(sfeat) if self.cluster_impl == "sklearn" else cluster_src,
            self.full_y,
            self.n_shot_cluster,
            impl=self.cluster_impl,
        )
        del cluster_src

        # Random: episodic sampler over the precomputed features
        # (support.py:126-129). Index math stays host-side (numpy).
        self._full_y_np = np.asarray(sy)
        self.random_sampler = EpisodicSampler(
            self._full_y_np, self.n_shot_random, seed=self.seed
        )

        # KNN / HNSW indexes (support.py:132-133). An incrementally-grown
        # HNSW (extend_bank) is reused; otherwise build fresh.
        from nwhead_tpu.ops.knn import ExactKNN

        self.knn = ExactKNN(
            self.full_feat, self.full_y, self.n_neighbors,
            host=not device_bank,
        )
        if hnsw is not None:
            self.hnsw = hnsw
        else:
            try:
                from nwhead_tpu.native.hnsw import HNSWIndex

                self.hnsw = HNSWIndex(self.full_feat, self.full_y, self.n_neighbors)
            except Exception:  # native module unavailable -> exact fallback
                self.hnsw = self.knn

    def _ensemble_banks(self):
        if self._ensemble_cache is None:
            import jax.numpy as jnp

            sfeat_env, sy_env = self.full_feat_sep, self.full_y_sep
            n_envs = len(sfeat_env)
            s_max = max(len(f) for f in sfeat_env)
            d = sfeat_env[0].shape[-1]
            ens_feat = np.zeros((n_envs, s_max, d), sfeat_env[0].dtype)
            ens_y = np.zeros((n_envs, s_max), np.int32)
            ens_mask = np.zeros((n_envs, s_max), np.float32)
            for e, (f, y) in enumerate(zip(sfeat_env, sy_env)):
                ens_feat[e, : len(f)] = f
                ens_y[e, : len(y)] = y
                ens_mask[e, : len(f)] = 1.0
            self._ensemble_cache = (
                jnp.asarray(ens_feat), jnp.asarray(ens_y), jnp.asarray(ens_mask)
            )
        return self._ensemble_cache

    def get_support(self, mode: str, x: Optional[np.ndarray] = None):
        """Support features/labels for an inference mode (``support.py:135-154``)."""
        try:
            if mode == "random":
                idx, _ = self.random_sampler.sample()
                return self.full_feat[idx], self.full_y[idx]
            if mode == "full":
                return self.full_feat, self.full_y
            if mode == "cluster":
                return self.cluster_feat, self.cluster_y
            if mode == "ensemble":
                # Device-resident stacked env banks + validity mask.
                return self._ensemble_banks()
            if mode == "knn":
                return self.knn(x)
            if mode == "hnsw":
                return self.hnsw(x)
            raise NotImplementedError(mode)
        except AttributeError as e:
            raise AttributeError("Did you run precompute()?") from e
