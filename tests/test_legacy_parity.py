"""Tests for legacy-tree capability equivalents: streaming inference,
index-space samplers, embedding disk cache, one-hot losses."""

import numpy as np
import pytest

import jax.numpy as jnp

from nwhead_tpu.nw.streaming import nw_streaming_log_probs
from nwhead_tpu.ops.nw import nw_log_probs
from nwhead_tpu.ops import metrics as M


def test_streaming_matches_single_shot(rng):
    B, S, D, C = 4, 700, 16, 6
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    s = rng.standard_normal((S, D)).astype(np.float32)
    sy = rng.integers(0, C, size=S).astype(np.int32)

    def chunks(sz):
        for start in range(0, S, sz):
            yield s[start : start + sz], sy[start : start + sz]

    want = np.asarray(nw_log_probs(q, jnp.asarray(s), jnp.asarray(sy), C))
    # Uneven last chunk exercises padding; fixed chunk_size gives one program.
    got = np.asarray(nw_streaming_log_probs(q, chunks(256), C, chunk_size=256))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_streaming_randomized_chunk_sweep():
    """Seeded sweep: streaming online-softmax must equal the single-shot
    op for ANY (S, chunk_size, kernel) combination — chunk boundaries and
    the padded last chunk are the failure surface."""
    from nwhead_tpu.ops.kernels import KERNEL_NAMES

    sweep_rng = np.random.default_rng(2031)
    kernels = list(KERNEL_NAMES)  # incl. clip (default logit_scale init)
    for trial in range(6):
        B = int(sweep_rng.integers(1, 5))
        S = int(sweep_rng.integers(40, 900))
        D = int(sweep_rng.integers(4, 48))
        C = int(sweep_rng.integers(2, 12))
        chunk = int(sweep_rng.choice([64, 100, 256]))
        kernel = kernels[int(sweep_rng.integers(len(kernels)))]
        ctx = f"trial={trial} B={B} S={S} D={D} C={C} chunk={chunk} {kernel}"
        q = jnp.asarray(sweep_rng.standard_normal((B, D)).astype(np.float32))
        s = sweep_rng.standard_normal((S, D)).astype(np.float32)
        sy = sweep_rng.integers(0, C, size=S).astype(np.int32)

        def chunks():
            for start in range(0, S, chunk):
                yield s[start:start + chunk], sy[start:start + chunk]

        want = np.asarray(nw_log_probs(
            q, jnp.asarray(s), jnp.asarray(sy), C, kernel=kernel
        ))
        got = np.asarray(nw_streaming_log_probs(
            q, chunks(), C, chunk_size=chunk, kernel=kernel
        ))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4,
                                   err_msg=ctx)


def test_streaming_from_disk_cache(tmp_path, rng):
    from nwhead_tpu.data import FeatureBankCache

    S, D, C = 300, 8, 4
    emb = rng.standard_normal((S, D)).astype(np.float32)
    lbl = rng.integers(0, C, size=S).astype(np.int64)
    cache = FeatureBankCache(str(tmp_path))
    assert not cache.exists()
    cache.save(emb, lbl, metadata=np.zeros(S))
    assert cache.exists()
    e2, l2, m2 = cache.load()
    np.testing.assert_array_equal(e2, emb)
    np.testing.assert_array_equal(l2, lbl)
    assert m2 is not None

    q = jnp.asarray(rng.standard_normal((2, D)).astype(np.float32))
    got = np.asarray(nw_streaming_log_probs(q, cache.chunks(128), C, chunk_size=128))
    want = np.asarray(nw_log_probs(q, jnp.asarray(emb), jnp.asarray(lbl.astype(np.int32)), C))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestSamplers:
    targets = np.repeat(np.arange(5), 6)

    def test_query_sampler(self):
        from nwhead_tpu.nw.samplers import QuerySampler

        s = QuerySampler(self.targets, seed=0)
        seen = list(s)
        assert sorted(seen) == list(range(30))

    def test_random_support_sampler(self):
        from nwhead_tpu.nw.samplers import RandomSupportSampler

        s = RandomSupportSampler(self.targets, n_support=8, num_batches=5, seed=0)
        batches = list(s)
        assert len(batches) == 5
        for b in batches:
            assert len(b) == 8 and len(set(b.tolist())) == 8

    def test_query_support_sampler(self):
        from nwhead_tpu.nw.samplers import QuerySupportSampler

        s = QuerySupportSampler(self.targets, n_shot=2, seed=0)
        q, sup = next(iter(s))
        assert len(sup) == 5 * 2
        uniq, counts = np.unique(self.targets[sup], return_counts=True)
        assert (counts == 2).all()

    def test_subsample_sampler(self):
        from nwhead_tpu.nw.samplers import SubsampleQuerySupportSampler

        s = SubsampleQuerySupportSampler(
            self.targets, n_shot=2, subsample_size=3, num_batches=10, seed=0
        )
        for q, sup in s:
            classes = np.unique(self.targets[sup])
            assert len(classes) == 3  # subsampled class count
            assert self.targets[q] in classes  # query class among them
            assert len(sup) == 3 * 2

    def test_batch_sampler(self):
        from nwhead_tpu.nw.samplers import QuerySupportBatchSampler

        s = QuerySupportBatchSampler(self.targets, batch_size=4, n_shot=1, n_way=3, seed=0)
        batches = list(s)
        assert len(batches) == 30 // 4
        for qidx, sup in batches:
            assert len(qidx) == 4 and len(sup) == 3


def test_onehot_losses(rng):
    C = 5
    lp = np.log(np.random.default_rng(3).dirichlet(np.ones(C), size=6)).astype(np.float32)
    t = np.array([0, 1, 2, 3, 4, 0])
    onehot = np.eye(C, dtype=np.float32)[t]
    a = float(M.nll_loss(jnp.asarray(lp), jnp.asarray(t)))
    b = float(M.nll_loss_onehot(jnp.asarray(lp), jnp.asarray(onehot)))
    assert a == pytest.approx(b, abs=1e-6)
    c = float(M.label_smoothing_loss_onehot(jnp.asarray(lp), jnp.asarray(onehot), 0.0))
    assert c == pytest.approx(a, abs=1e-6)
    d = float(M.label_smoothing_loss_onehot(jnp.asarray(lp), jnp.asarray(onehot), 0.2))
    assert d != pytest.approx(a, abs=1e-4)


def test_step_timer():
    from nwhead_tpu.utils.profiling import StepTimer

    t = StepTimer()
    with t.phase("a"):
        pass
    t.record("b", 0.5)
    s = t.summary()
    assert s["b"]["total_s"] == pytest.approx(0.5)
    assert "a" in t.report()
