"""ShardedSupportBank.remove_rows / NWNet.remove_support under a mesh.

Mesh removals tombstone rows in the LIVE per-shard banks — O(removed)
device work, shapes unchanged (the shard_mapped predict re-closes over
the new arrays without a recompile). Prepared mode reuses the
single-device ``mask_prepared_rows`` machinery on the shard-concatenated
arrays; raw mode scatters the validity mask. Numerically identical to a
rebuild over the kept rows, because masked rows contribute exact-zero
softmax weight. The reference's only support-edit path is a full
``precompute()`` (``/root/reference/nwhead/nw.py:118-125``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from nwhead_tpu.ops.nw import nw_log_probs
from nwhead_tpu.parallel import ShardedSupportBank, make_mesh


def _q_sharded(mesh, q):
    return jax.device_put(jnp.asarray(q), NamedSharding(mesh, P("data")))


@pytest.mark.parametrize("use_prepared", [False, True])
@pytest.mark.parametrize("precision", ["f32", "int8"])
def test_remove_rows_matches_rebuilt_bank(rng, use_prepared, precision):
    if precision != "f32" and not use_prepared:
        pytest.skip("reduced precision requires the prepared path")
    mesh = make_mesh(2, 4)
    B, S, D, C = 8, 600, 32, 7  # S not divisible by shards -> padding path
    q = rng.standard_normal((B, D)).astype(np.float32)
    s = rng.standard_normal((S, D)).astype(np.float32)
    sy = rng.integers(0, C, size=S).astype(np.int32)
    drop = np.unique(rng.permutation(S)[:80])
    keep = np.setdiff1d(np.arange(S), drop)

    bank = ShardedSupportBank.build(
        s, sy, mesh, C, precision=precision,
        use_prepared=True if use_prepared else False,
    )
    assert bank.rowmap is not None and len(bank.rowmap) == S
    removed = bank.remove_rows(drop)
    assert removed.dead == len(drop)
    assert len(removed.rowmap) == len(keep)
    # Shapes unchanged — the predict recompiles nothing.
    assert removed.capacity == bank.capacity

    got = np.asarray(removed.predict_fn()(_q_sharded(mesh, q)))
    if precision == "int8":
        # Same per-row quantization either way (row-local) — the oracle is
        # a rebuilt int8 bank over the kept rows; only the shard/summation
        # layout differs.
        oracle = ShardedSupportBank.build(
            s[keep], sy[keep], mesh, C, precision="int8", use_prepared=True
        )
        want = np.asarray(oracle.predict_fn()(_q_sharded(mesh, q)))
    else:
        want = np.asarray(
            nw_log_probs(jnp.asarray(q), jnp.asarray(s[keep]),
                         jnp.asarray(sy[keep]), C)
        )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_remove_rows_chained_and_windowed(rng):
    """Sequential removals compose through the updated rowmap, including
    class-windowed prepared banks (C > 128)."""
    mesh = make_mesh(1, 8)
    B, S, D, C = 4, 520, 16, 300
    q = rng.standard_normal((B, D)).astype(np.float32)
    s = rng.standard_normal((S, D)).astype(np.float32)
    sy = rng.integers(0, C, size=S).astype(np.int32)

    bank = ShardedSupportBank.build(s, sy, mesh, C, use_prepared=True)
    live = np.arange(S)
    for seed in (1, 2):
        r = np.random.default_rng(seed)
        drop = np.unique(r.permutation(len(live))[:40])
        bank = bank.remove_rows(drop)
        live = np.delete(live, drop)
    got = np.asarray(bank.predict_fn()(_q_sharded(mesh, q)))
    want = np.asarray(
        nw_log_probs(jnp.asarray(q), jnp.asarray(s[live]),
                     jnp.asarray(sy[live]), C)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_remove_rows_bounds_and_empty(rng):
    mesh = make_mesh(1, 8)
    s = rng.standard_normal((256, 16)).astype(np.float32)
    sy = rng.integers(0, 5, size=256).astype(np.int32)
    bank = ShardedSupportBank.build(s, sy, mesh, 5, use_prepared=True)
    assert bank.remove_rows(np.array([], np.int64)) is bank
    with pytest.raises(IndexError):
        bank.remove_rows(np.array([256]))
    with pytest.raises(IndexError):
        bank.remove_rows(np.array([-1]))


def test_nwnet_mesh_remove_support_tombstones(rng, monkeypatch):
    """NWNet.remove_support under a mesh takes the O(removed) fast path
    (no shard rebuild) below the compaction threshold and still matches a
    meshless net over the same remaining bank."""
    import flax.linen as nn

    from nwhead_tpu.data import make_synthetic_dataset
    from nwhead_tpu.nw.net import NWNet

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = True):
            x = nn.Conv(8, (3, 3), padding="SAME")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
            x = nn.relu(x)
            x = jnp.mean(x, axis=(1, 2))
            return nn.Dense(16)(x)

    ds = make_synthetic_dataset(n=60, n_classes=4, size=8, seed=0)
    mesh = make_mesh(2, 4)

    def build(mesh_arg):
        net = NWNet(
            Tiny(), n_classes=4, support_dataset=ds, feat_dim=16,
            n_shot=1, n_shot_full=5, seed=0, mesh=mesh_arg,
        )
        variables = net.init(
            jax.random.PRNGKey(0), jnp.asarray(ds.gather(np.arange(2)))
        )
        net.precompute(variables)
        return net, variables

    net_s, var_s = build(mesh)
    net_u, var_u = build(None)
    cap_before = net_s.sharded_bank.capacity
    prep_id = id(net_s.sharded_bank.prepared.s) \
        if net_s.sharded_bank.prepared is not None else None

    # The full bank is n_shot_full * n_classes = 20 rows.
    drop = np.asarray([3, 9, 17])
    net_s.remove_support(var_s, drop)
    net_u.remove_support(var_u, drop)

    bank = net_s.sharded_bank
    assert bank.dead == len(drop)
    assert bank.capacity == cap_before  # tombstoned, not rebuilt
    if prep_id is not None:
        # The feature array itself is untouched (shared, not re-prepared).
        assert id(bank.prepared.s) == prep_id

    x = jnp.asarray(ds.gather(np.arange(4)))
    got = np.asarray(net_s.predict(var_s, x, "full"))
    want = np.asarray(net_u.predict(var_u, x, "full"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    # Past the dead threshold the removal compacts (fresh bank). The tiny
    # test bank's capacity is padding-dominated (the fraction is against
    # STREAMED rows, the real cost) — force the threshold to zero.
    monkeypatch.setattr(type(net_s), "_COMPACT_DEAD_FRAC", -1.0)
    net_s.remove_support(var_s, [0, 1])
    assert net_s.sharded_bank.dead == 0
    assert len(net_s.sharded_bank.rowmap) == 20 - len(drop) - 2
