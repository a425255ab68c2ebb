"""mask_prepared_rows / NWNet.remove_support tombstone fast path.

Removal masks rows in the LIVE prepared bank (label -> -1 sentinel, l2
self-norm -> the mask sentinel) — O(removed) device work, numerically
identical to a full re-prepare because masked rows contribute exact-zero
softmax weight (the same machinery padding rows already use). The
reference rebuilds everything on any support edit
(``/root/reference/nwhead/nw.py:118-125``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nwhead_tpu.ops.pallas_nw import (
    mask_prepared_rows,
    nw_fused_log_probs,
    prepare_support,
)

BS = 128


def _mk(S, D, C, seed=0):
    rng = np.random.default_rng(seed)
    f = jnp.asarray(rng.standard_normal((S, D)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, C, size=S).astype(np.int32))
    q = jnp.asarray(rng.standard_normal((8, D)).astype(np.float32))
    return f, y, q


def _probs(q, prep, C):
    return np.exp(np.asarray(nw_fused_log_probs(q, prep, None, C)))


@pytest.mark.parametrize("precision", ["f32", "bf16", "int8"])
@pytest.mark.parametrize(
    "C,kernel", [(40, "euclidean"), (300, "euclidean"), (40, "dotproduct"),
                 (300, "cosine")]
)
def test_mask_rows_equals_masked_prepare(precision, C, kernel):
    f, y, q = _mk(512, 64, C, seed=C + len(kernel))
    rng = np.random.default_rng(1)
    drop = rng.permutation(512)[:90]
    mask = np.ones(512, np.float32)
    mask[drop] = 0.0

    prep, order = prepare_support(
        f, y, C, kernel=kernel, precision=precision, block_s=BS,
        return_order=True,
    )
    pos = np.arange(512, dtype=np.int64)
    if order is not None:
        pos = np.empty(512, np.int64)
        pos[order] = np.arange(512)
    masked = mask_prepared_rows(prep, pos[drop])

    oracle = prepare_support(
        f, y, C, kernel=kernel, precision=precision, block_s=BS,
        support_mask=jnp.asarray(mask),
    )
    # Same rows at the same positions with the same quantization — the
    # only difference is that the oracle also zeroes masked FEATURES
    # (harmless: tombstoned features are finite and their weight is 0).
    np.testing.assert_allclose(
        _probs(q, masked, C), _probs(q, oracle, C), rtol=0, atol=1e-6
    )


def test_mask_rows_bounds_and_empty():
    f, y, _ = _mk(256, 32, 10)
    prep = prepare_support(f, y, 10, block_s=BS)
    assert mask_prepared_rows(prep, np.array([], np.int64)) is prep
    with pytest.raises(IndexError):
        mask_prepared_rows(prep, np.array([512]))
    with pytest.raises(IndexError):
        mask_prepared_rows(prep, np.array([-1]))


def test_return_order_roundtrip_windowed():
    """order[j] = input row at prepared position j; masking through the
    inverse map must hit exactly the intended input rows (C > 128 banks
    are class-sorted, so the map is a real permutation)."""
    C = 300
    f, y, q = _mk(384, 32, C, seed=5)
    prep, order = prepare_support(f, y, C, block_s=BS, return_order=True)
    assert order is not None and sorted(order) == list(range(384))
    keep_two = np.arange(384)[:2]  # drop everything except rows 0, 1
    inv = np.empty(384, np.int64)
    inv[order] = np.arange(384)
    masked = mask_prepared_rows(prep, inv[np.arange(2, 384)])
    oracle = prepare_support(
        f[:2], y[:2], C, block_s=BS
    )
    np.testing.assert_allclose(
        _probs(q, masked, C), _probs(q, oracle, C), rtol=0, atol=1e-5
    )
    del keep_two


# ---------------------------------------------------------------------------
# Net-level: remove_support fast path
# ---------------------------------------------------------------------------


def _tiny_net(ds, n_classes=4):
    import flax.linen as nn

    from nwhead_tpu.nw.net import NWNet

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = True):
            x = jnp.mean(nn.relu(nn.Conv(8, (3, 3))(x)), axis=(1, 2))
            return nn.Dense(16)(x)

    return NWNet(
        Tiny(), n_classes=n_classes, support_dataset=ds, feat_dim=16,
        n_shot=2, n_shot_full=100, seed=0, fused_min_support=1,
    )


def test_net_remove_support_goes_tombstone(monkeypatch):
    """remove_support with a live prepared bank must not re-prepare the
    bank; the tombstoned bank must match a fresh restore_bank net on the
    remaining rows."""
    from nwhead_tpu.data import make_synthetic_dataset

    ds = make_synthetic_dataset(n=48, n_classes=4, size=8, seed=0)
    queries = jnp.asarray(
        make_synthetic_dataset(n=8, n_classes=4, size=8, seed=3).images
    )
    net = _tiny_net(ds)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(ds.images[:2]))
    net.precompute(variables)
    assert net._prepared_full is not None and net._prepared_pos is not None
    n0 = len(np.asarray(net.full_y))

    import nwhead_tpu.ops.pallas_nw as pnw

    calls = []
    real = pnw.prepare_support
    monkeypatch.setattr(
        pnw, "prepare_support",
        lambda *a, **k: calls.append(1) or real(*a, **k),
    )
    drop = np.array([0, 5, 17, 31])
    net.remove_support(variables, drop)
    assert not calls, "fast path must not re-prepare"
    assert net._prepared_dead == 4
    assert len(net._prepared_pos) == n0 - 4
    monkeypatch.undo()

    # Oracle: a net with the remaining features installed directly.
    fresh = _tiny_net(ds)
    fresh.restore_bank(
        variables, np.asarray(net.full_feat), np.asarray(net.full_y)
    )
    out1 = np.asarray(net.predict(variables, queries, mode="full"))
    out2 = np.asarray(fresh.predict(variables, queries, mode="full"))
    np.testing.assert_allclose(out1, out2, rtol=0, atol=1e-5)

    # Second removal keeps compounding on the same tombstoned bank.
    net.remove_support(variables, np.array([1, 2]))
    fresh2 = _tiny_net(ds)
    fresh2.restore_bank(
        variables, np.asarray(net.full_feat), np.asarray(net.full_y)
    )
    out1 = np.asarray(net.predict(variables, queries, mode="full"))
    out2 = np.asarray(fresh2.predict(variables, queries, mode="full"))
    np.testing.assert_allclose(out1, out2, rtol=0, atol=1e-5)
    assert net._prepared_dead == 6


def test_net_remove_support_compacts_past_threshold():
    """Once tombstones exceed 25% of the prepared bank the removal path
    re-prepares (dead counter resets, map shrinks to live rows)."""
    from nwhead_tpu.data import make_synthetic_dataset

    ds = make_synthetic_dataset(n=48, n_classes=4, size=8, seed=0)
    net = _tiny_net(ds)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(ds.images[:2]))
    net.precompute(variables)
    s_rows = (
        net._prepared_full.lane.shape[0]
        * net._prepared_full.lane.shape[1] * 128
    )
    drop = np.arange(int(0.3 * s_rows))  # > 25% in one call
    net.remove_support(variables, drop)
    assert net._prepared_dead == 0  # compaction happened
    assert len(net._prepared_pos) == 48 - len(drop)
    # And the compacted bank serves correctly.
    queries = jnp.asarray(
        make_synthetic_dataset(n=8, n_classes=4, size=8, seed=3).images
    )
    out = np.asarray(net.predict(variables, queries, mode="full"))
    assert np.isfinite(out).all()


def test_net_add_then_remove_mixed_envs():
    """The row->prepared-position map must survive mid-bank env inserts:
    add env 1, then env 0 again (inserted in the MIDDLE of the full-bank
    order), then remove a mix of old/new rows — parity vs a fresh net on
    the surviving features."""
    from nwhead_tpu.data import make_synthetic_dataset

    ds = make_synthetic_dataset(n=32, n_classes=4, size=8, seed=0)
    ex1 = make_synthetic_dataset(n=8, n_classes=4, size=8, seed=7)
    ex0 = make_synthetic_dataset(n=8, n_classes=4, size=8, seed=11)
    queries = jnp.asarray(
        make_synthetic_dataset(n=8, n_classes=4, size=8, seed=3).images
    )
    net = _tiny_net(ds)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(ds.images[:2]))
    net.precompute(variables)
    net.add_support(variables, ex1.images, ex1.targets, env_id=1)
    net.add_support(variables, ex0.images, ex0.targets, env_id=0)
    # env 0's new rows went mid-bank (before env 1's segment).
    meta = np.asarray(net.support_eval.full_meta)
    assert meta[32:40].tolist() == [0] * 8 and meta[40:48].tolist() == [1] * 8
    assert net._prepared_pos is not None and len(net._prepared_pos) == 48

    rng = np.random.default_rng(2)
    drop = rng.permutation(48)[:9]
    net.remove_support(variables, drop)

    fresh = _tiny_net(ds)
    fresh.restore_bank(
        variables, np.asarray(net.full_feat), np.asarray(net.full_y),
        meta=np.asarray(net.support_eval.full_meta),
    )
    out1 = np.asarray(net.predict(variables, queries, mode="full"))
    out2 = np.asarray(fresh.predict(variables, queries, mode="full"))
    np.testing.assert_allclose(out1, out2, rtol=0, atol=1e-5)
