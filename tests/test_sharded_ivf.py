"""Sharded IVF-pruned serving: per-shard routing over the mesh.

Each device routes queries against its LOCAL tile centroids and streams
only the selected tiles; the usual online-softmax partials merge combines
the shards (exact — ``parallel/sharded_bank.py``). Per-shard top-``n_probe``
is a superset of the global top-``n_probe`` restricted to that shard, so
recall is at least the single-device IVF's. With ``n_probe >= local tile
count`` every tile is selected and the output must equal the un-routed
sharded full mode bit-for-bit semantics (same accumulation per shard).

Reference anchor: the reference has no distributed path at all
(``/root/reference/train.py:128-133``); the pruned-subset softmax
semantics mirror its knn/hnsw union supports
(``/root/reference/nwhead/support.py:135-154``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nwhead_tpu.ops.nw import nw_log_probs
from nwhead_tpu.parallel import ShardedSupportBank, make_mesh


def _clustered_bank(S, C, D, B, seed=0, scale=4.0):
    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((C, D)) * scale
    sy = rng.integers(0, C, S).astype(np.int32)
    sf = (cents[sy] + 0.3 * rng.standard_normal((S, D))).astype(np.float32)
    qy = rng.integers(0, C, B)
    q = (cents[qy] + 0.3 * rng.standard_normal((B, D))).astype(np.float32)
    return sf, sy, q


class TestShardedIVF:
    @pytest.mark.parametrize("precision", ["f32", "int8"])
    def test_full_probe_matches_unrouted(self, precision):
        """n_probe >= every shard's tile count selects all tiles — the
        routed predict must agree with the un-routed sharded predict and
        with the naive single-device op."""
        sf, sy, q = _clustered_bank(S=1600, C=7, D=48, B=16, seed=1)
        mesh = make_mesh(2, 4)
        bank = ShardedSupportBank.build(
            sf, sy, mesh, 7, precision=precision, use_prepared=True,
            ivf=True,
        )
        assert bank.ivf_cents is not None
        n_tiles_local = bank.prepared.lane.shape[0] // 4
        routed = bank.predict_fn(ivf_n_probe=n_tiles_local)
        plain = bank.predict_fn()
        out_r = np.asarray(routed(jnp.asarray(q)))
        out_p = np.asarray(plain(jnp.asarray(q)))
        pd = np.abs(np.exp(out_r) - np.exp(out_p)).max()
        assert pd < 1e-6, pd
        want = np.asarray(nw_log_probs(
            jnp.asarray(q), jnp.asarray(sf), jnp.asarray(sy), 7
        ))
        tol = 5e-3 if precision == "int8" else 1e-4
        pd2 = np.abs(np.exp(out_r) - np.exp(want)).max()
        assert pd2 < tol, pd2

    def test_pruned_routing_top1_agreement(self):
        """Well-separated clustered bank, small n_probe: per-shard routing
        must recall the query's class tiles — perfect top-1 agreement
        with the exact answer."""
        # 64 rows/class, block_s rounds to the local shard size so each
        # shard holds multiple class-sorted tiles.
        sf, sy, q = _clustered_bank(S=8192, C=16, D=64, B=16, seed=2)
        mesh = make_mesh(1, 8)
        bank = ShardedSupportBank.build(
            sf, sy, mesh, 16, precision="f32", use_prepared=True, ivf=True,
        )
        n_tiles_total = bank.prepared.lane.shape[0]
        assert n_tiles_total >= 8
        routed = bank.predict_fn(ivf_n_probe=2)
        out = np.asarray(routed(jnp.asarray(q)))
        want = np.asarray(nw_log_probs(
            jnp.asarray(q), jnp.asarray(sf), jnp.asarray(sy), 16
        ))
        agree = (out.argmax(1) == want.argmax(1)).mean()
        assert agree == 1.0, agree

    def test_windowed_many_class_bank(self):
        """C > 128 with ivf=True: per-shard class sort + window='keep'
        must produce class windows (unless concat drops them), and the
        routed full-probe output stays exact."""
        sf, sy, q = _clustered_bank(S=4096, C=200, D=48, B=8, seed=3)
        mesh = make_mesh(2, 4)
        bank = ShardedSupportBank.build(
            sf, sy, mesh, 200, precision="f32", use_prepared=True,
            ivf=True,
        )
        n_tiles_local = bank.prepared.lane.shape[0] // 4
        routed = bank.predict_fn(ivf_n_probe=n_tiles_local)
        out = np.asarray(routed(jnp.asarray(q)))
        want = np.asarray(nw_log_probs(
            jnp.asarray(q), jnp.asarray(sf), jnp.asarray(sy), 200
        ))
        pd = np.abs(np.exp(out) - np.exp(want)).max()
        assert pd < 1e-4, pd

    def test_remove_rows_keeps_exactness_at_full_probe(self):
        """Tombstoned rows must contribute zero weight through the routed
        path (stale centroids only mis-rank probes, never corrupt the
        subset softmax)."""
        sf, sy, q = _clustered_bank(S=1024, C=5, D=32, B=8, seed=4)
        mesh = make_mesh(2, 4)
        bank = ShardedSupportBank.build(
            sf, sy, mesh, 5, precision="f32", use_prepared=True, ivf=True,
        )
        drop = np.arange(0, 1024, 3)
        bank2 = bank.remove_rows(drop)
        assert bank2.ivf_cents is not None  # index carried over
        keep = np.setdiff1d(np.arange(1024), drop)
        n_tiles_local = bank2.prepared.lane.shape[0] // 4
        routed = bank2.predict_fn(ivf_n_probe=n_tiles_local)
        out = np.asarray(routed(jnp.asarray(q)))
        want = np.asarray(nw_log_probs(
            jnp.asarray(q), jnp.asarray(sf[keep]), jnp.asarray(sy[keep]), 5
        ))
        pd = np.abs(np.exp(out) - np.exp(want)).max()
        assert pd < 1e-4, pd

    def test_raw_mode_rejects_probe(self):
        sf, sy, _ = _clustered_bank(S=256, C=4, D=16, B=4, seed=5)
        mesh = make_mesh(1, 8)
        bank = ShardedSupportBank.build(
            sf, sy, mesh, 4, use_prepared=False, ivf=True,
        )
        with pytest.raises(ValueError, match="raw-mode"):
            bank.predict_fn(ivf_n_probe=2)
        # Prepared bank built WITHOUT ivf: probe must be rejected too.
        bank2 = ShardedSupportBank.build(
            sf, sy, mesh, 4, use_prepared=True,
        )
        with pytest.raises(ValueError, match="ivf=True"):
            bank2.predict_fn(ivf_n_probe=2)


class TestNWNetMeshIVF:
    def test_net_level_mode_ivf(self):
        """NWNet under a mesh serves mode='ivf' through the sharded routed
        path (no single-device bank copy)."""
        import flax.linen as nn

        from nwhead_tpu.data.datasets import ArrayDataset
        from nwhead_tpu.nw.net import NWNet

        class Tiny(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                return nn.Dense(32)(x.reshape(x.shape[0], -1))

        rng = np.random.default_rng(6)
        xs = rng.standard_normal((256, 4, 4, 3)).astype(np.float32)
        ys = rng.integers(0, 8, 256).astype(np.int32)
        ds = ArrayDataset(xs, ys)
        mesh = make_mesh(2, 4)
        net = NWNet(
            Tiny(), n_classes=8, support_dataset=ds, feat_dim=32,
            n_shot_full=32, ivf_n_probe=64, mesh=mesh,
            head_precision="int8",  # forces the prepared sharded path on CPU
        )
        variables = net.init(jax.random.PRNGKey(0), jnp.asarray(xs[:2]))
        net.precompute(variables)
        assert net.sharded_bank is not None
        assert net.sharded_bank.ivf_cents is not None
        out = np.asarray(net.predict(variables, jnp.asarray(xs[:8]), "ivf"))
        full = np.asarray(net.predict(variables, jnp.asarray(xs[:8]), "full"))
        # Probe count covers every tile -> same answer as full mode.
        pd = np.abs(np.exp(out) - np.exp(full)).max()
        assert pd < 1e-5, pd
        # Cache hit: second call reuses the compiled fn (identity check).
        cached = net._ivf_cache
        _ = net.predict(variables, jnp.asarray(xs[:8]), "ivf")
        assert net._ivf_cache is cached
