"""concat_prepared / prepare_for_concat: O(new) prepared-bank growth.

Every PreparedSupport field is tile-local, so banks prepared with the same
kernel/precision/tile size concatenate by stacking tiles. These tests pin
the invariant the serving paths rely on: a concatenated bank is
numerically interchangeable (up to accumulation order) with one prepared
over the whole row set, across precisions, class-window regimes (C > 128),
and masks. The reference has no analog — its bank is re-built from scratch
on every ``precompute()`` (``/root/reference/nwhead/nw.py:118-125``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nwhead_tpu.ops.pallas_nw import (
    concat_prepared,
    nw_fused_log_probs,
    prepare_for_concat,
    prepare_support,
)

BS = 128  # explicit tile size: every chunk must share it to concatenate


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
    "C,kernel", [(40, "euclidean"), (300, "euclidean"), (300, "cosine")]
)
def test_concat_matches_whole_bank_prepare(precision, C, kernel):
    f, y, q = _mk(640, 64, C, seed=C)
    cuts = [(0, 256), (256, 384), (384, 640)]
    preps = [
        prepare_support(
            f[a:b], y[a:b], C, kernel=kernel, precision=precision,
            block_s=BS,
        )
        for a, b in cuts
    ]
    cat = concat_prepared(preps, C)
    whole = prepare_support(
        f, y, C, kernel=kernel, precision=precision, block_s=BS
    )
    # Rows are quantized/normalized PER ROW, so chunked preparation gives
    # bit-identical rows; only softmax accumulation order differs.
    np.testing.assert_allclose(
        _probs(q, cat, C), _probs(q, whole, C), rtol=0, atol=1e-5
    )


def test_concat_widens_windows_to_max_width():
    C, D = 500, 32  # c_pad = 512
    rng = np.random.default_rng(3)
    f1 = jnp.asarray(rng.standard_normal((128, D)).astype(np.float32))
    y1 = jnp.asarray(rng.integers(0, 100, size=128).astype(np.int32))  # W=128
    f2 = jnp.asarray(rng.standard_normal((128, D)).astype(np.float32))
    y2 = jnp.asarray(rng.integers(0, 260, size=128).astype(np.int32))  # W=384
    p1 = prepare_support(f1, y1, C, block_s=BS)
    p2 = prepare_support(f2, y2, C, block_s=BS)
    assert p1.win is not None and p1.win.shape[1] == 1
    assert p2.win is not None and p2.win.shape[1] == 3
    cat = concat_prepared([p1, p2], C)
    assert cat.win is not None and cat.win.shape[1] == 3
    # Starts stay within bounds and each tile's span stays covered.
    assert int(np.max(np.asarray(cat.win))) * 128 + 384 <= 512
    q = jnp.asarray(rng.standard_normal((8, D)).astype(np.float32))
    whole = prepare_support(
        jnp.concatenate([f1, f2]), jnp.concatenate([y1, y2]), C, block_s=BS
    )
    np.testing.assert_allclose(
        _probs(q, cat, C), _probs(q, whole, C), rtol=0, atol=1e-5
    )


def test_concat_drops_windows_when_one_chunk_is_full_width():
    C, D = 300, 32  # c_pad = 384
    rng = np.random.default_rng(4)
    f1 = jnp.asarray(rng.standard_normal((128, D)).astype(np.float32))
    y1 = jnp.asarray(rng.integers(0, 50, size=128).astype(np.int32))
    f2 = jnp.asarray(rng.standard_normal((128, D)).astype(np.float32))
    y2 = jnp.asarray(  # spans the full class range -> un-windowed chunk
        np.concatenate([[0, 299], rng.integers(0, 300, size=126)]).astype(
            np.int32
        )
    )
    p1 = prepare_support(f1, y1, C, block_s=BS)
    p2 = prepare_support(f2, y2, C, block_s=BS)
    assert p1.win is not None and p2.win is None
    cat = concat_prepared([p1, p2], C)
    assert cat.win is None  # dropped everywhere, never mixed
    q = jnp.asarray(rng.standard_normal((8, D)).astype(np.float32))
    whole = prepare_support(
        jnp.concatenate([f1, f2]), jnp.concatenate([y1, y2]), C, block_s=BS
    )
    np.testing.assert_allclose(
        _probs(q, cat, C), _probs(q, whole, C), rtol=0, atol=1e-5
    )


def test_concat_respects_masks():
    C, D = 40, 32
    f, y, q = _mk(384, D, C, seed=9)
    rng = np.random.default_rng(10)
    mask = jnp.asarray((rng.random(384) > 0.3).astype(np.float32))
    preps = [
        prepare_support(
            f[a:b], y[a:b], C, support_mask=mask[a:b], block_s=BS
        )
        for a, b in [(0, 128), (128, 384)]
    ]
    cat = concat_prepared(preps, C)
    whole = prepare_support(f, y, C, support_mask=mask, block_s=BS)
    np.testing.assert_allclose(
        _probs(q, cat, C), _probs(q, whole, C), rtol=0, atol=1e-5
    )


def test_prepare_for_concat_pads_small_adds_to_tile_size():
    C, D = 300, 32
    f, y, q = _mk(256, D, C, seed=11)
    base = prepare_support(f, y, C, block_s=BS)
    rng = np.random.default_rng(12)
    nf = jnp.asarray(rng.standard_normal((37, D)).astype(np.float32))
    ny = jnp.asarray(rng.integers(0, 60, size=37).astype(np.int32))
    inc = prepare_for_concat(nf, ny, C, base)
    assert inc.lane.shape[1] == base.lane.shape[1]  # tile-compatible
    cat = concat_prepared([base, inc], C)
    whole = prepare_support(
        jnp.concatenate([f, nf]), jnp.concatenate([y, ny]), C, block_s=BS
    )
    np.testing.assert_allclose(
        _probs(q, cat, C), _probs(q, whole, C), rtol=0, atol=1e-5
    )


def test_concat_validation_errors():
    C, D = 40, 32
    f, y, _ = _mk(256, D, C)
    p32 = prepare_support(f[:128], y[:128], C, block_s=BS)
    pi8 = prepare_support(f[128:], y[128:], C, block_s=BS, precision="int8")
    with pytest.raises(ValueError, match="precision"):
        concat_prepared([p32, pi8], C)
    p_big = prepare_support(f, y, C, block_s=256)
    with pytest.raises(ValueError, match="tile size"):
        concat_prepared([p32, p_big], C)
    pdot = prepare_support(f[:128], y[:128], C, block_s=BS,
                           kernel="dotproduct")
    with pytest.raises(ValueError, match="s2c"):
        concat_prepared([p32, pdot], C)
    with pytest.raises(ValueError, match="at least one"):
        concat_prepared([], C)
    assert concat_prepared([p32], C) is p32


def test_net_add_support_goes_incremental(monkeypatch):
    """NWNet.add_support with a live prepared bank must prepare ONLY the
    new rows (padded to one tile), and the grown bank must match a fresh
    full precompute — the O(new) fast path, not a silent full rebuild."""
    from nwhead_tpu.data import make_synthetic_dataset
    from nwhead_tpu.data.datasets import ArrayDataset
    from nwhead_tpu.nw.net import NWNet
    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = True):
            x = jnp.mean(nn.relu(nn.Conv(8, (3, 3))(x)), axis=(1, 2))
            return nn.Dense(16)(x)

    # Balanced sizes (8 = 2 per class): the fresh-net oracle's FullDataset
    # caps per-class counts at the min class count, so an unbalanced extra
    # would make the two banks hold different row SETS.
    ds = make_synthetic_dataset(n=48, n_classes=4, size=8, seed=0)
    extra = make_synthetic_dataset(n=8, n_classes=4, size=8, seed=7)
    queries = jnp.asarray(
        make_synthetic_dataset(n=8, n_classes=4, size=8, seed=3).images
    )

    def mk(support):
        net = NWNet(
            Tiny(), n_classes=4, support_dataset=support, feat_dim=16,
            n_shot=2, n_shot_full=100, seed=0, fused_min_support=1,
        )
        return net

    net = mk(ds)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(ds.images[:2]))
    net.precompute(variables)
    assert net._prepared_full is not None
    tile = net._prepared_full.lane.shape[1] * 128

    import nwhead_tpu.ops.pallas_nw as pnw

    sizes = []
    real = pnw.prepare_support

    def spy(sfeat, *a, **k):
        sizes.append(int(sfeat.shape[0]))
        return real(sfeat, *a, **k)

    monkeypatch.setattr(pnw, "prepare_support", spy)
    net.add_support(variables, extra.images, extra.targets)
    # Only the padded new chunk went through prepare — never the full bank.
    assert sizes and max(sizes) <= tile
    monkeypatch.undo()

    union = ArrayDataset(
        np.concatenate([ds.images, extra.images]),
        np.concatenate([ds.targets, extra.targets]),
        num_classes=4,
    )
    fresh = mk(union)
    fresh.precompute(variables)
    out1 = np.asarray(net.predict(variables, queries, mode="full"))
    out2 = np.asarray(fresh.predict(variables, queries, mode="full"))
    np.testing.assert_allclose(out1, out2, rtol=0, atol=1e-5)
