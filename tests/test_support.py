"""Support-engine behavior tests: episodic sampler guarantees, balanced full
bank, environment shapes, IRM sampling, k-means and knn artifacts."""

import numpy as np
import pytest

from nwhead_tpu.nw.support import (
    EpisodicSampler,
    Environments,
    SupportSetEval,
    SupportSetTrain,
    balanced_full_indices,
    get_separated_indices,
)


def test_get_separated_indices_docstring_example():
    assert get_separated_indices([0, 1, 1, 2, 3]) == [[0], [1, 2], [3], [4]]


def test_get_separated_indices_nonconsecutive_labels():
    # Non-consecutive labels map to consecutive buckets (utils.py:142-159).
    assert get_separated_indices([10, 5, 10, 99]) == [[1], [0, 2], [3]]


def test_balanced_full_indices():
    targets = [0] * 5 + [1] * 3 + [2] * 10
    idx = balanced_full_indices(targets, n_shot_full=4)
    # Capped at min class count (3), first-k per class, deterministic.
    np.testing.assert_array_equal(idx, [0, 1, 2, 5, 6, 7, 8, 9, 10])
    got = np.asarray(targets)[idx]
    for c in range(3):
        assert (got == c).sum() == 3


class TestEpisodicSampler:
    def _targets(self, n_classes=8, per_class=6):
        return np.repeat(np.arange(n_classes), per_class)

    def test_episode_size_and_coverage_with_n_way(self):
        t = self._targets()
        s = EpisodicSampler(t, n_shot=2, n_way=5, seed=0)
        qy = np.array([1, 3])
        for _ in range(20):
            idx, labels = s.sample(qy)
            assert len(idx) == 5 * 2  # n_way * n_shot, constant
            # Every query class present (utils.py:126-131).
            assert set(qy.tolist()) <= set(labels.tolist())
            # Exactly n_way distinct classes, n_shot each.
            uniq, counts = np.unique(labels, return_counts=True)
            assert len(uniq) == 5 and (counts == 2).all()
            # No replacement within a class.
            assert len(set(idx.tolist())) == len(idx)
            # Labels consistent with the dataset.
            np.testing.assert_array_equal(t[idx], labels)

    def test_query_classes_excluded_from_other_draw(self):
        """Non-query classes are drawn uniformly from classes NOT in qy."""
        t = self._targets(n_classes=4, per_class=4)
        s = EpisodicSampler(t, n_shot=1, n_way=3, seed=0)
        qy = np.array([0, 1])
        others = set()
        for _ in range(50):
            _, labels = s.sample(qy)
            others |= set(labels.tolist()) - {0, 1}
        assert others == {2, 3}

    def test_without_n_way_samples_all_classes(self):
        t = self._targets(n_classes=5, per_class=4)
        s = EpisodicSampler(t, n_shot=3, seed=0)
        idx, labels = s.sample()
        assert len(idx) == 5 * 3
        uniq, counts = np.unique(labels, return_counts=True)
        assert len(uniq) == 5 and (counts == 3).all()

    def test_qy_larger_than_n_way_asserts(self):
        t = self._targets()
        s = EpisodicSampler(t, n_shot=1, n_way=2, seed=0)
        with pytest.raises(AssertionError):
            s.sample(np.array([0, 1, 2]))


class TestEnvironments:
    def test_single_dataset_no_envs(self):
        e = Environments.build(np.array([0, 1, 1, 0]))
        assert e.n_envs == 1
        np.testing.assert_array_equal(e.env_array, 0)

    def test_env_array(self):
        e = Environments.build(np.array([0, 1, 1, 0]), env_array=[0, 0, 1, 1])
        assert e.n_envs == 2
        np.testing.assert_array_equal(e.env_indices(1), [2, 3])

    def test_list_of_datasets(self):
        e = Environments.build([np.array([0, 1]), np.array([1, 0, 1])])
        assert e.n_envs == 2
        np.testing.assert_array_equal(e.targets, [0, 1, 1, 0, 1])
        np.testing.assert_array_equal(e.env_array, [0, 0, 1, 1, 1])


class TestSupportSetTrain:
    def test_random_mode(self):
        targets = np.repeat(np.arange(6), 5)
        st = SupportSetTrain(targets, n_classes=6, n_shot=2, n_way=4, seed=0)
        assert st.support_size() == 8
        idx, labels, meta = st.get_support(np.array([2, 5]))
        assert len(idx) == 8
        assert {2, 5} <= set(labels.tolist())
        np.testing.assert_array_equal(meta, 0)

    def test_irm_single_env_per_step(self):
        targets = np.repeat(np.arange(3), 8)
        env = np.tile(np.repeat([0, 1], 4), 3)
        st = SupportSetTrain(
            targets, n_classes=3, train_type="irm", n_shot=2, env_array=env, seed=0
        )
        assert st.support_size() == 6
        seen_envs = set()
        for _ in range(20):
            idx, labels, meta = st.get_support()
            # Whole support from ONE environment (support.py:76-78).
            assert len(set(meta.tolist())) == 1
            seen_envs.add(int(meta[0]))
            np.testing.assert_array_equal(targets[idx], labels)
            uniq, counts = np.unique(labels, return_counts=True)
            assert len(uniq) == 3 and (counts == 2).all()
        assert seen_envs == {0, 1}  # both environments get sampled

    def test_bad_train_type(self):
        with pytest.raises(ValueError):
            SupportSetTrain(np.array([0, 1]), n_classes=2, train_type="nope")


class TestSupportSetEval:
    def _make(self, seed=0):
        rng = np.random.default_rng(seed)
        targets = np.repeat(np.arange(4), 10)
        se = SupportSetEval(
            targets,
            n_classes=4,
            n_shot_random=2,
            n_shot_full=5,
            n_shot_cluster=2,
            n_neighbors=3,
            seed=seed,
        )
        # Fake "precomputed" features: class-separated Gaussians.
        bank_idx = np.concatenate(se.full_bank_indices)
        bank_y = targets[bank_idx]
        feats = rng.standard_normal((len(bank_idx), 8)).astype(np.float32)
        feats += bank_y[:, None] * 10.0
        se.build_infer_iters(feats, bank_y, np.zeros(len(bank_y)), [feats], [bank_y], [np.zeros(len(bank_y))])
        return se, feats, bank_y

    def test_full_bank_is_balanced_and_capped(self):
        se, feats, bank_y = self._make()
        assert len(feats) == 4 * 5  # n_shot_full=5 per class
        uniq, counts = np.unique(bank_y, return_counts=True)
        assert (counts == 5).all()

    def test_modes(self):
        se, feats, bank_y = self._make()
        sf, sy = se.get_support("full")
        assert sf.shape == feats.shape

        sf, sy = se.get_support("random")
        assert sf.shape == (4 * 2, 8)
        uniq, counts = np.unique(sy, return_counts=True)
        assert (counts == 2).all()

        sf, sy = se.get_support("cluster")
        assert sf.shape == (4 * 2, 8)
        np.testing.assert_array_equal(sy, np.repeat(np.arange(4), 2))
        # Centroids of well-separated classes live near the class mean.
        for c in range(4):
            centroid_mean = sf[sy == c].mean(0)
            class_mean = feats[bank_y == c].mean(0)
            assert np.linalg.norm(centroid_mean - class_mean) < 5.0

        env_f, env_y, env_m = se.get_support("ensemble")
        # Stacked device-resident (E, S_max, D) banks + validity mask.
        assert env_f.ndim == 3 and env_f.shape[0] == 1
        assert env_m.shape == env_f.shape[:2] and float(env_m.min()) >= 0.0

        q = feats[:2] + 0.01
        sf, sy = se.get_support("knn", x=q)
        assert sf.shape == (2 * 3, 8)
        # Nearest neighbors of a bank point (plus noise) share its class.
        assert (sy[:3] == bank_y[0]).all()

        sf2, sy2 = se.get_support("hnsw", x=q)
        assert sf2.shape == sf.shape

    def test_unknown_mode(self):
        se, *_ = self._make()
        with pytest.raises(NotImplementedError):
            se.get_support("nope")

    def test_precompute_guard(self):
        targets = np.repeat(np.arange(4), 10)
        se = SupportSetEval(targets, n_classes=4)
        with pytest.raises(AttributeError, match="precompute"):
            se.get_support("full")


def test_compute_clusters_closest_returns_real_features(rng):
    from nwhead_tpu.ops.kmeans import compute_clusters

    feats = rng.standard_normal((30, 4)).astype(np.float32)
    labels = np.repeat([0, 1, 2], 10)
    sf, sy = compute_clusters(feats, labels, n_clusters=2, closest=True)
    assert sf.shape == (6, 4)
    np.testing.assert_array_equal(sy, [0, 0, 1, 1, 2, 2])
    # Every returned row is an actual dataset feature.
    for row in sf:
        assert (np.abs(feats - row).sum(1) < 1e-6).any()


def test_knn_indices_exact(rng):
    import jax.numpy as jnp
    from nwhead_tpu.ops.knn import knn_indices

    bank = rng.standard_normal((50, 6)).astype(np.float32)
    q = rng.standard_normal((4, 6)).astype(np.float32)
    got = np.asarray(knn_indices(jnp.asarray(q), jnp.asarray(bank), 5))
    d2 = ((q[:, None, :] - bank[None, :, :]) ** 2).sum(-1)
    want = np.argsort(d2, axis=-1)[:, :5]
    np.testing.assert_array_equal(np.sort(got, -1), np.sort(want, -1))


def test_episodic_sampler_n_way_equals_n_classes():
    """n_way == n_classes with full query coverage must not divide by zero
    (the reference crashes here)."""
    t = np.repeat(np.arange(4), 6)
    s = EpisodicSampler(t, n_shot=2, n_way=4, seed=0)
    idx, labels = s.sample(np.array([0, 1, 2, 3]))
    assert len(idx) == 8
    uniq, counts = np.unique(labels, return_counts=True)
    assert len(uniq) == 4 and (counts == 2).all()
    # Partial coverage with duplicates also works.
    idx, labels = s.sample(np.array([0, 0, 1]))
    assert len(idx) == 4 * 2


def test_knn_indices_chunked_matches_exact(rng):
    import jax.numpy as jnp
    from nwhead_tpu.ops.knn import knn_indices, knn_indices_chunked

    bank = rng.standard_normal((512, 16)).astype(np.float32)
    q = rng.standard_normal((6, 16)).astype(np.float32)
    a = np.asarray(knn_indices(jnp.asarray(q), jnp.asarray(bank), 7))
    b = np.asarray(knn_indices_chunked(jnp.asarray(q), jnp.asarray(bank), 7, chunk=128))
    np.testing.assert_array_equal(np.sort(a, -1), np.sort(b, -1))


def test_exact_knn_host_matches_device_with_ties(rng):
    """Host-mode ExactKNN (mesh nets keep the bank on host) must select
    the SAME neighbors as the device path, including on exact distance
    ties: lax.top_k breaks ties by lowest index, and the host stable sort
    must too. Duplicate rows straddling the k boundary are the trap."""
    from nwhead_tpu.ops.knn import ExactKNN

    D, k = 8, 3
    base = rng.standard_normal((4, D)).astype(np.float32)
    # Bank with each row duplicated (ties everywhere); k=3 cuts through a
    # duplicate pair for any query near a base row.
    bank = np.repeat(base, 2, axis=0)  # rows 0,1 identical; 2,3; ...
    labels = np.arange(len(bank), dtype=np.int64)  # identity -> row id
    q = (base[:2] + 1e-3 * rng.standard_normal((2, D))).astype(np.float32)

    host = ExactKNN(bank, labels, n_neighbors=k, host=True)
    dev = ExactKNN(bank, labels, n_neighbors=k, host=False)
    sf_h, sy_h = host(q)
    sf_d, sy_d = dev(q)
    np.testing.assert_array_equal(sy_h, sy_d)  # same rows, same order
    np.testing.assert_allclose(np.asarray(sf_h), np.asarray(sf_d))
