"""Incremental serving-bank updates: NWNet.add_support / remove_support.

The reference has no incremental path — any support-set edit requires a
full ``precompute()`` that re-featurizes the entire bank (``nw.py:118-125``).
Here only the new images are featurized; every eval artifact is refreshed
from cached features, and HNSW grows by online insertion.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nwhead_tpu.data import make_synthetic_dataset
from nwhead_tpu.data.datasets import ArrayDataset
from nwhead_tpu.nw.net import NWNet


def _tiny_backbone(feat_dim=16):
    import flax.linen as nn

    class Tiny(nn.Module):
        feat_dim: int = 16

        @nn.compact
        def __call__(self, x, train: bool = True):
            x = nn.Conv(8, (3, 3), padding="SAME")(x)
            x = nn.relu(x)
            x = jnp.mean(x, axis=(1, 2))
            return nn.Dense(self.feat_dim)(x)

    return Tiny(feat_dim=feat_dim)


def _make_net(ds, n_classes=4, **kw):
    net = NWNet(
        _tiny_backbone(),
        n_classes=n_classes,
        support_dataset=ds,
        feat_dim=16,
        n_shot=2,
        n_way=3,
        n_shot_full=100,
        n_shot_cluster=2,
        n_neighbors=3,
        seed=0,
        **kw,
    )
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(ds.images[:2]))
    return net, variables


@pytest.fixture(scope="module")
def base():
    ds = make_synthetic_dataset(n=32, n_classes=4, size=8, seed=0)
    extra = make_synthetic_dataset(n=8, n_classes=4, size=8, seed=7)
    queries = jnp.asarray(make_synthetic_dataset(n=8, n_classes=4, size=8, seed=3).images)
    return ds, extra, queries


def test_add_support_matches_fresh_precompute(base):
    ds, extra, queries = base
    net1, variables = _make_net(ds)
    net1.precompute(variables)
    net1.add_support(variables, extra.images, extra.targets)

    union = ArrayDataset(
        np.concatenate([ds.images, extra.images]),
        np.concatenate([ds.targets, extra.targets]),
        num_classes=4,
    )
    net2, _ = _make_net(union)
    net2.precompute(variables)

    assert net1.full_feat.shape == net2.full_feat.shape
    # The NW head is permutation-invariant over support rows, so full-mode
    # log-probs must agree even though the two banks order rows differently.
    out1 = np.asarray(net1.predict(variables, queries, mode="full"))
    out2 = np.asarray(net2.predict(variables, queries, mode="full"))
    np.testing.assert_allclose(out1, out2, rtol=0, atol=1e-5)
    # knn mode: same bank as a set -> same union-support -> same log-probs.
    outk1 = np.asarray(net1.predict(variables, queries, mode="knn"))
    outk2 = np.asarray(net2.predict(variables, queries, mode="knn"))
    np.testing.assert_allclose(outk1, outk2, rtol=0, atol=1e-5)


def test_randomized_edit_sequence_matches_fresh_precompute(base):
    """Invariant under ANY edit sequence: after random interleaved
    add_support/remove_support chains, full-mode and knn-mode predictions
    equal a fresh net precomputed over the surviving items (the NW head is
    permutation-invariant over support rows). Seeded, 2 sequences x 5 ops."""
    ds, _, queries = base
    pool = make_synthetic_dataset(n=40, n_classes=4, size=8, seed=11)
    for seq_seed in (0, 1):
        seq_rng = np.random.default_rng(seq_seed)
        net, variables = _make_net(ds)
        net.precompute(variables)
        # Host-side ledger of what the bank should contain, in bank order.
        bank_idx = np.concatenate(net.support_eval.full_bank_indices)
        ledger_imgs = list(np.asarray(ds.gather(bank_idx)))
        ledger_y = list(np.asarray(ds.targets)[bank_idx])
        pool_pos = 0
        for _ in range(5):
            if seq_rng.integers(2) == 0 and pool_pos + 3 <= len(pool):
                add = np.arange(pool_pos, pool_pos + 3)
                pool_pos += 3
                net.add_support(variables, pool.images[add], pool.targets[add])
                ledger_imgs += list(pool.images[add])
                ledger_y += list(pool.targets[add])
            else:
                n = len(ledger_y)
                drop = sorted(seq_rng.choice(n, size=min(2, n - 8), replace=False).tolist())
                if not drop:
                    continue
                net.remove_support(variables, np.asarray(drop))
                ledger_imgs = [im for i, im in enumerate(ledger_imgs) if i not in drop]
                ledger_y = [y for i, y in enumerate(ledger_y) if i not in drop]

        # The oracle installs the SAME surviving items via restore_bank
        # (a fresh balanced precompute would re-cap unbalanced classes).
        fresh, _ = _make_net(ds)
        feats = np.asarray(fresh._featurize_eval(
            variables, jnp.asarray(np.stack(ledger_imgs))
        ))
        fresh.restore_bank(variables, feats, np.asarray(ledger_y))
        assert len(np.asarray(net.full_y)) == len(ledger_y)
        for mode in ("full", "knn"):
            got = np.asarray(net.predict(variables, queries, mode=mode))
            want = np.asarray(fresh.predict(variables, queries, mode=mode))
            np.testing.assert_allclose(got, want, rtol=0, atol=2e-5,
                                       err_msg=f"seq={seq_seed} mode={mode}")


@pytest.mark.parametrize("precision", ["int8", "int4"])
def test_edit_sequence_quantized_bank_matches_restore(base, precision):
    """Incremental edits on a QUANTIZED prepared bank equal a fresh restore
    over the survivors: per-row symmetric quantization is row-local, so the
    same rows produce the same codes no matter how the bank was chunked,
    grown, or tombstoned (windows may widen-or-drop — output-invariant)."""
    ds, _, queries = base
    pool = make_synthetic_dataset(n=40, n_classes=4, size=8, seed=11)
    net, variables = _make_net(ds, head_precision=precision)
    net.precompute(variables)
    bank_idx = np.concatenate(net.support_eval.full_bank_indices)
    ledger_imgs = list(np.asarray(ds.gather(bank_idx)))
    ledger_y = list(np.asarray(ds.targets)[bank_idx])
    seq_rng = np.random.default_rng(5)
    pool_pos = 0
    for _ in range(4):
        if seq_rng.integers(2) == 0 and pool_pos + 3 <= len(pool):
            add = np.arange(pool_pos, pool_pos + 3)
            pool_pos += 3
            net.add_support(variables, pool.images[add], pool.targets[add])
            ledger_imgs += list(pool.images[add])
            ledger_y += list(pool.targets[add])
        else:
            n = len(ledger_y)
            drop = sorted(seq_rng.choice(
                n, size=min(2, n - 8), replace=False).tolist())
            if not drop:
                continue
            net.remove_support(variables, np.asarray(drop))
            ledger_imgs = [im for i, im in enumerate(ledger_imgs)
                           if i not in drop]
            ledger_y = [y for i, y in enumerate(ledger_y) if i not in drop]

    fresh, _ = _make_net(ds, head_precision=precision)
    feats = np.asarray(fresh._featurize_eval(
        variables, jnp.asarray(np.stack(ledger_imgs))
    ))
    fresh.restore_bank(variables, feats, np.asarray(ledger_y))
    got = np.asarray(net.predict(variables, queries, mode="full"))
    want = np.asarray(fresh.predict(variables, queries, mode="full"))
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-5,
                               err_msg=precision)


def test_bank_edits_clear_canonical_order_flag(base):
    """Row -> dataset-index identity (serve.py --explain, bank caches)
    holds only in canonical precompute order; any incremental edit must
    clear the flag — length equality alone cannot catch an equal-size
    add-then-remove that re-ordered every row."""
    ds, extra, _ = base
    net, variables = _make_net(ds)
    net.precompute(variables)
    assert net.support_eval.bank_is_canonical
    n_before = len(np.asarray(net.full_y))
    net.add_support(variables, extra.images, extra.targets)
    assert not net.support_eval.bank_is_canonical
    net.remove_support(variables, np.arange(len(extra.targets)))
    # Same size as the original bank again — the flag must stay cleared.
    assert len(np.asarray(net.full_y)) == n_before
    assert not net.support_eval.bank_is_canonical
    # A fresh precompute restores canonical order.
    net.precompute(variables)
    assert net.support_eval.bank_is_canonical


def test_add_then_remove_restores_bank_exactly(base):
    ds, extra, queries = base
    net, variables = _make_net(ds)
    net.precompute(variables)
    before = np.asarray(net.predict(variables, queries, mode="full"))
    n0 = len(np.asarray(net.full_y))

    net.add_support(variables, extra.images, extra.targets)
    assert len(np.asarray(net.full_y)) == n0 + len(extra.targets)
    after_add = np.asarray(net.predict(variables, queries, mode="full"))
    assert not np.allclose(before, after_add)

    # New rows append at the tail of their env block (single env here).
    net.remove_support(variables, np.arange(n0, n0 + len(extra.targets)))
    restored = np.asarray(net.predict(variables, queries, mode="full"))
    np.testing.assert_array_equal(before, restored)


def test_add_new_class_becomes_predictable():
    # Bank initially holds only classes 0-2 of a 4-class head.
    ds = make_synthetic_dataset(n=48, n_classes=4, size=8, seed=0)
    keep = ds.targets != 3
    ds3 = ArrayDataset(ds.images[keep], ds.targets[keep], num_classes=4)
    net, variables = _make_net(ds3)
    net.precompute(variables)
    assert 3 not in np.asarray(net.full_y)

    new = ds.images[~keep][:6]
    net.add_support(variables, new, np.full(6, 3))
    assert 3 in np.asarray(net.full_y)
    # Querying the very items just added: each self-matches at distance 0,
    # the strongest possible support weight -> argmax must be the new class.
    out = np.asarray(net.predict(variables, jnp.asarray(new), mode="full"))
    assert (out.argmax(-1) == 3).all()


def test_incremental_hnsw_reused_and_consistent(base):
    ds, extra, _ = base
    net, variables = _make_net(ds)
    net.precompute(variables)
    from nwhead_tpu.native.hnsw import HNSWIndex

    if not isinstance(net.support_eval.hnsw, HNSWIndex):
        pytest.skip("native HNSW unavailable")
    idx_before = net.support_eval.hnsw
    net.add_support(variables, extra.images, extra.targets)
    # Online insertion: the SAME graph object grew, no rebuild.
    assert net.support_eval.hnsw is idx_before
    assert len(idx_before.labels) == len(np.asarray(net.full_y))
    # Querying a new item's own feature must return it as nearest.
    f = idx_before.data[-1][None]
    ids = idx_before.knn_query(f, k=1)
    assert ids[0, 0] == len(idx_before.labels) - 1


def test_env_add_extends_ensemble(base):
    ds, extra, queries = base
    net, variables = _make_net(ds)
    net.precompute(variables)
    assert len(net.support_eval.full_feat_sep) == 1
    net.add_support(variables, extra.images, extra.targets, env_id=1)
    assert len(net.support_eval.full_feat_sep) == 2
    out = np.asarray(net.predict(variables, queries, mode="ensemble"))
    assert out.shape == (len(queries), 4)
    assert np.isfinite(out).all()
    # random mode keeps working over the extended sampler.
    net.predict(variables, queries, mode="random")
    # cluster artifacts were refreshed over the extended bank.
    net.predict(variables, queries, mode="cluster")


def test_serving_fn_sees_live_bank_update(base):
    ds, extra, queries = base
    net, variables = _make_net(ds, fused_min_support=1)
    net.precompute(variables)
    assert net._prepared_full is not None
    fn = net.make_serving_fn(variables)
    out1 = np.asarray(fn(queries))
    net.add_support(variables, extra.images, extra.targets)
    out2 = np.asarray(fn(queries))  # same callable, updated bank
    assert not np.allclose(out1, out2)
    np.testing.assert_allclose(
        out2, np.asarray(net.predict(variables, queries, mode="full")),
        rtol=0, atol=1e-5,
    )


def test_add_support_validation(base):
    ds, extra, _ = base
    net, variables = _make_net(ds)
    with pytest.raises(AttributeError, match="precompute"):
        net.support_eval.extend_bank(np.zeros((1, 16), np.float32), np.zeros(1))
    net.precompute(variables)
    with pytest.raises(ValueError, match="labels"):
        net.add_support(variables, extra.images[:2], np.array([0, 9]))
    with pytest.raises(IndexError):
        net.remove_support(variables, [10_000])


def test_add_support_on_mesh_rebuilds_sharded_bank(base):
    ds, extra, queries = base
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    from nwhead_tpu.parallel import make_mesh

    mesh = make_mesh(n_data=1, n_support=len(jax.devices()))
    net, variables = _make_net(ds, mesh=mesh)
    net.precompute(variables)
    net.add_support(variables, extra.images, extra.targets)
    out = np.asarray(net.predict(variables, queries, mode="full"))

    union = ArrayDataset(
        np.concatenate([ds.images, extra.images]),
        np.concatenate([ds.targets, extra.targets]),
        num_classes=4,
    )
    ref, _ = _make_net(union)  # single-device oracle
    ref.precompute(variables)
    np.testing.assert_allclose(
        out, np.asarray(ref.predict(variables, queries, mode="full")),
        rtol=0, atol=1e-5,
    )


def test_randomized_edit_sequence_on_mesh_matches_restore_oracle(base):
    """The mesh variant of the randomized edit-sequence invariant: after
    seeded interleaved add_support/remove_support chains on a
    NWNet(mesh=...), the SHARDED full and knn predict paths must equal a
    restore_bank oracle over the surviving items (single-device oracle —
    the sharded merges are exact, so cross-path agreement is the claim)."""
    ds, _, queries = base
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual multi-device mesh")
    from nwhead_tpu.parallel import make_mesh

    mesh = make_mesh(n_data=2, n_support=4)
    pool = make_synthetic_dataset(n=40, n_classes=4, size=8, seed=11)
    seq_rng = np.random.default_rng(2)
    net, variables = _make_net(ds, mesh=mesh)
    net.precompute(variables)
    assert net.sharded_bank is not None
    bank_idx = np.concatenate(net.support_eval.full_bank_indices)
    ledger_imgs = list(np.asarray(ds.gather(bank_idx)))
    ledger_y = list(np.asarray(ds.targets)[bank_idx])
    pool_pos = 0
    for _ in range(4):
        if seq_rng.integers(2) == 0 and pool_pos + 3 <= len(pool):
            add = np.arange(pool_pos, pool_pos + 3)
            pool_pos += 3
            net.add_support(variables, pool.images[add], pool.targets[add])
            ledger_imgs += list(pool.images[add])
            ledger_y += list(pool.targets[add])
        else:
            n = len(ledger_y)
            drop = sorted(seq_rng.choice(
                n, size=min(2, n - 8), replace=False).tolist())
            if not drop:
                continue
            net.remove_support(variables, np.asarray(drop))
            ledger_imgs = [im for i, im in enumerate(ledger_imgs)
                           if i not in drop]
            ledger_y = [y for i, y in enumerate(ledger_y) if i not in drop]

    assert net.sharded_bank is not None  # edits rebuilt, not dropped, it
    fresh, _ = _make_net(ds)  # single-device oracle
    feats = np.asarray(fresh._featurize_eval(
        variables, jnp.asarray(np.stack(ledger_imgs))
    ))
    fresh.restore_bank(variables, feats, np.asarray(ledger_y))
    assert len(np.asarray(net.full_y)) == len(ledger_y)
    for mode in ("full", "knn"):
        got = np.asarray(net.predict(variables, queries, mode=mode))
        want = np.asarray(fresh.predict(variables, queries, mode=mode))
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-5,
                                   err_msg=f"mode={mode}")


def test_add_support_with_quantized_featurizer():
    """Incremental adds run the NEW images through the quantized featurizer
    and must match a fresh quantized precompute over the union bank."""
    from nwhead_tpu.models import load_model

    ds = make_synthetic_dataset(n=40, n_classes=4, size=32, seed=0)
    extra = make_synthetic_dataset(n=8, n_classes=4, size=32, seed=5)
    queries = jnp.asarray(ds.gather(np.arange(8)))

    def fresh(support):
        net = NWNet(
            load_model("resnet10"), n_classes=4, support_dataset=support,
            feat_dim=512, n_shot=1, n_shot_full=100, seed=0,
        )
        return net

    net1 = fresh(ds)
    variables = net1.init(jax.random.PRNGKey(0), queries)
    net1.quantize_featurizer(variables, ds.gather(np.arange(32)))
    net1.precompute(variables)
    net1.add_support(variables, extra.images, extra.targets)

    union = ArrayDataset(
        np.concatenate([ds.images, extra.images]),
        np.concatenate([ds.targets, extra.targets]),
        num_classes=4,
    )
    net2 = fresh(union)
    net2.quantize_featurizer(variables, ds.gather(np.arange(32)))
    net2.precompute(variables)

    out1 = np.asarray(net1.predict(variables, queries, mode="full"))
    out2 = np.asarray(net2.predict(variables, queries, mode="full"))
    np.testing.assert_allclose(out1, out2, rtol=0, atol=1e-5)


def test_serving_fn_loud_error_when_prepared_bank_goes_away(base):
    """A bank edit that drops the prepared bank (here: shrinking below
    fused_min_support) must make existing serving callables fail with a
    clear ValueError, not a NoneType trace error inside jit."""
    ds, extra, queries = base
    net, variables = _make_net(ds, fused_min_support=len(ds.targets))
    net.precompute(variables)
    fn = net.make_serving_fn(variables)
    np.asarray(fn(queries))
    net.remove_support(variables, [0, 1])  # now below fused_min_support
    assert net._prepared_full is None
    with pytest.raises(ValueError, match="prepared serving bank"):
        fn(queries)


def test_remove_emptied_env_keeps_ensemble_finite(base):
    """Removing every item of one environment must drop that env (an
    all-masked env row would softmax over -inf and NaN-poison ensemble
    mode)."""
    ds, extra, queries = base
    net, variables = _make_net(ds)
    net.precompute(variables)
    net.add_support(variables, extra.images, extra.targets, env_id=1)
    n0 = len(ds.targets)
    # env 1 rows sit at the tail (env-contiguous layout).
    net.remove_support(variables, np.arange(n0, n0 + len(extra.targets)))
    assert len(net.support_eval.full_feat_sep) == 1
    out = np.asarray(net.predict(variables, queries, mode="ensemble"))
    assert np.isfinite(out).all()


def test_remove_everything_refused(base):
    ds, _, _ = base
    net, variables = _make_net(ds)
    net.precompute(variables)
    with pytest.raises(ValueError, match="every support item"):
        net.remove_support(variables, np.arange(len(ds.targets)))


def test_failed_extend_leaves_hnsw_consistent(base, monkeypatch):
    """If the artifact rebuild fails mid-extend, the HNSW index must still
    match the installed (old) bank — the graph grows only after a
    successful install."""
    ds, extra, _ = base
    net, variables = _make_net(ds)
    net.precompute(variables)
    from nwhead_tpu.native.hnsw import HNSWIndex

    if not isinstance(net.support_eval.hnsw, HNSWIndex):
        pytest.skip("native HNSW unavailable")
    n_before = len(net.support_eval.hnsw.labels)

    import nwhead_tpu.nw.support as support_mod

    def boom(*a, **k):
        raise RuntimeError("install failed")

    monkeypatch.setattr(
        support_mod.SupportSetEval, "_install_bank", boom
    )
    with pytest.raises(RuntimeError, match="install failed"):
        net.add_support(variables, extra.images, extra.targets)
    assert len(net.support_eval.hnsw.labels) == n_before
