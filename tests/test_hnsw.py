"""C++ HNSW index tests: recall vs exact KNN, interface parity."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def index_and_data():
    from nwhead_tpu.native.hnsw import HNSWIndex

    rng = np.random.default_rng(0)
    n, d = 2000, 32
    data = rng.standard_normal((n, d)).astype(np.float32)
    labels = rng.integers(0, 10, size=n)
    idx = HNSWIndex(data, labels, n_neighbors=10)
    return idx, data, labels


def test_builds_and_sizes(index_and_data):
    idx, data, labels = index_and_data
    from nwhead_tpu.native.hnsw import _lib

    assert _lib().hnsw_size(idx._handle) == len(data)


def test_recall_vs_exact(index_and_data):
    idx, data, labels = index_and_data
    rng = np.random.default_rng(1)
    q = rng.standard_normal((50, data.shape[1])).astype(np.float32)
    got = idx.knn_query(q, k=10)

    d2 = ((q[:, None, :] - data[None, :, :]) ** 2).sum(-1)
    exact = np.argsort(d2, axis=-1)[:, :10]
    recall = np.mean([
        len(set(g.tolist()) & set(e.tolist())) / 10.0 for g, e in zip(got, exact)
    ])
    assert recall > 0.9, f"HNSW recall@10 {recall}"


def test_self_query_returns_self(index_and_data):
    idx, data, labels = index_and_data
    got = idx.knn_query(data[:20], k=1)
    np.testing.assert_array_equal(got[:, 0], np.arange(20))


def test_flat_concat_support_interface(index_and_data):
    idx, data, labels = index_and_data
    q = data[:3] + 0.001
    sfeat, sy = idx(q)
    assert sfeat.shape == (3 * 10, data.shape[1])
    assert sy.shape == (3 * 10,)
    # First neighbor of each query block is the query's own bank row.
    np.testing.assert_array_equal(sy[[0, 10, 20]], labels[:3])


def test_recall_on_large_clustered_bank():
    """Graph quality at scale: 50k rows in 100 tight clusters — the regime
    where closest-m neighbor selection (no diversification) collapses links
    into single clusters and recall degrades. The hnswlib-style heuristic
    (hnsw.cpp select_neighbors) must keep recall@10 >= 0.9 vs exact."""
    from nwhead_tpu.native.hnsw import HNSWIndex

    rng = np.random.default_rng(0)
    centers = rng.standard_normal((100, 16)).astype(np.float32) * 4
    assign = rng.integers(0, 100, size=50_000)
    data = centers[assign] + rng.standard_normal((50_000, 16)).astype(np.float32) * 0.4
    labels = assign % 10

    idx = HNSWIndex(data, labels, n_neighbors=10)
    q = centers[rng.integers(0, 100, size=100)]
    q = q + rng.standard_normal((100, 16)).astype(np.float32) * 0.4
    got = idx.knn_query(q, k=10)

    d2 = ((q[:, None, :] - data[None, :, :]) ** 2).sum(-1)
    exact = np.argsort(d2, axis=-1)[:, :10]
    recall = np.mean([
        len(set(g.tolist()) & set(e.tolist())) / 10.0 for g, e in zip(got, exact)
    ])
    assert recall >= 0.9, f"clustered-bank recall@10 {recall}"
