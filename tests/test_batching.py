"""MicroBatcher: dynamic micro-batching front end for batched serving."""

import threading
import time

import numpy as np
import pytest

from nwhead_tpu.utils.batching import MicroBatcher


def _counting_serve(record):
    def serve(batch):
        record.append(np.asarray(batch).shape)
        return np.asarray(batch).sum(axis=tuple(range(1, batch.ndim))) * 2.0

    return serve


def test_results_match_direct_computation():
    calls = []
    with MicroBatcher(_counting_serve(calls), max_batch=8, max_wait_ms=5) as mb:
        items = [np.full((4, 4), float(i)) for i in range(20)]
        futs = [mb.submit(x) for x in items]
        got = [f.result(timeout=10) for f in futs]
    for i, g in enumerate(got):
        assert g == pytest.approx(i * 16 * 2.0)
    # Every dispatched batch had the one compiled shape (padding included).
    assert all(s == (8, 4, 4) for s in calls)


def test_full_batch_coalesces_into_one_call():
    calls = []
    mb = MicroBatcher(_counting_serve(calls), max_batch=8, max_wait_ms=200)
    futs = [mb.submit(np.ones((2,)) * i) for i in range(8)]
    [f.result(timeout=10) for f in futs]
    # 8 submissions, batch full -> exactly one serve call, no timeout wait.
    assert len(calls) == 1
    mb.close()


def test_partial_batch_dispatches_after_max_wait():
    calls = []
    mb = MicroBatcher(_counting_serve(calls), max_batch=64, max_wait_ms=30)
    t0 = time.monotonic()
    f = mb.submit(np.ones((3,)))
    assert f.result(timeout=10) == pytest.approx(6.0)
    elapsed = time.monotonic() - t0
    assert elapsed >= 0.02  # waited for the latency bound, not forever
    assert calls and calls[0] == (64, 3)
    mb.close()


def test_concurrent_submitters():
    calls = []
    mb = MicroBatcher(_counting_serve(calls), max_batch=16, max_wait_ms=5)
    results = {}

    def client(i):
        results[i] = mb.submit(np.full((2, 2), float(i))).result(timeout=10)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(50)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    mb.close()
    for i in range(50):
        assert results[i] == pytest.approx(i * 4 * 2.0)


def test_error_propagates_to_callers():
    def boom(batch):
        raise RuntimeError("device on fire")

    mb = MicroBatcher(boom, max_batch=4, max_wait_ms=5)
    f = mb.submit(np.ones((2,)))
    with pytest.raises(RuntimeError, match="device on fire"):
        f.result(timeout=10)
    mb.close()


def test_close_drains_then_rejects():
    calls = []
    mb = MicroBatcher(_counting_serve(calls), max_batch=8, max_wait_ms=500)
    futs = [mb.submit(np.ones((2,)) * i) for i in range(3)]
    mb.close()  # must flush the partial batch without waiting 500 ms
    for i, f in enumerate(futs):
        assert f.result(timeout=1) == pytest.approx(i * 2 * 2.0)
    with pytest.raises(RuntimeError, match="closed"):
        mb.submit(np.ones((2,)))


def test_microbatcher_over_nwnet_serving_fn():
    """End to end: single-image submits through NWNet's one-dispatch
    serving callable produce the same log-probs as a direct batched
    predict."""
    import jax
    import jax.numpy as jnp

    from nwhead_tpu.data import make_synthetic_dataset
    from nwhead_tpu.nw.net import NWNet
    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = True):
            x = nn.Conv(8, (3, 3), padding="SAME")(x)
            x = jnp.mean(x, axis=(1, 2))
            return nn.Dense(16)(x)

    ds = make_synthetic_dataset(n=32, n_classes=4, size=8, seed=0)
    net = NWNet(Tiny(), 4, support_dataset=ds, feat_dim=16,
                n_shot_full=100, seed=0, fused_min_support=1)
    queries = jnp.asarray(ds.images[:6])
    variables = net.init(jax.random.PRNGKey(0), queries)
    net.precompute(variables)
    fn = net.make_serving_fn(variables)
    want = np.asarray(fn(jnp.asarray(np.asarray(queries))))

    # The batcher pads to the compiled shape; wrap fn to accept numpy.
    with MicroBatcher(lambda b: fn(jnp.asarray(b)), max_batch=6,
                      max_wait_ms=20) as mb:
        futs = [mb.submit(np.asarray(queries[i])) for i in range(6)]
        got = np.stack([f.result(timeout=30) for f in futs])
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_serve_cli_microbatch_bench():
    """serve.py --microbatch_bench end to end on the synthetic set."""
    import serve

    out = serve.main([
        "--dataset", "synthetic", "--arch", "resnet10",
        "--batch_size", "8", "--n_shot_full", "5",
        "--microbatch_bench", "--bench_batches", "2",
        "--concurrency", "4", "--microbatch_wait_ms", "10",
    ])
    rep = out["microbatch"]
    assert rep["achieved_qps"] > 0
    assert rep["requests"] == 4 * 2 * max(4, 8 // 2)
    assert 1 <= rep["mean_batch_occupancy"] <= 8
