"""Multi-device tests on the virtual 8-CPU mesh: sharded full-mode predict
must equal the single-device op exactly (modulo fp32), and data-parallel
training steps must run with sharded batches."""

import os
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from nwhead_tpu.ops.nw import nw_log_probs
from nwhead_tpu.parallel import ShardedSupportBank, make_mesh


def test_eight_devices_available():
    assert jax.device_count() == 8


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (4, 2)])
def test_sharded_full_mode_matches_single_device(rng, mesh_shape):
    n_data, n_support = mesh_shape
    mesh = make_mesh(n_data, n_support)
    B, S, D, C = 8, 1000, 64, 11  # S not divisible by shards -> padding path
    q = rng.standard_normal((B, D)).astype(np.float32)
    s = rng.standard_normal((S, D)).astype(np.float32)
    sy = rng.integers(0, C, size=S).astype(np.int32)

    bank = ShardedSupportBank.build(s, sy, mesh, C)
    predict = bank.predict_fn()
    got = np.asarray(predict(jax.device_put(jnp.asarray(q), NamedSharding(mesh, P("data")))))

    want = np.asarray(nw_log_probs(jnp.asarray(q), jnp.asarray(s), jnp.asarray(sy), C))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_sharded_kernel_variants(rng):
    mesh = make_mesh(1, 8)
    B, S, D, C = 4, 512, 32, 5
    q = rng.standard_normal((B, D)).astype(np.float32)
    s = rng.standard_normal((S, D)).astype(np.float32)
    sy = rng.integers(0, C, size=S).astype(np.int32)
    for kernel in ["euclidean", "cosine", "dotproduct", "hypersphere_euclidean"]:
        bank = ShardedSupportBank.build(s, sy, mesh, C, kernel=kernel)
        got = np.asarray(bank.predict_fn()(jnp.asarray(q)))
        want = np.asarray(nw_log_probs(jnp.asarray(q), jnp.asarray(s), jnp.asarray(sy), C, kernel=kernel))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4)])
def test_sharded_prepared_bank_matches_single_device(rng, mesh_shape):
    """The prepared sharded path (per-shard double-buffered serving kernel,
    interpret mode on CPU) must equal the single-device op."""
    n_data, n_support = mesh_shape
    mesh = make_mesh(n_data, n_support)
    B, S, D, C = 8, 600, 32, 7  # S not divisible by shards -> padding path
    q = rng.standard_normal((B, D)).astype(np.float32)
    s = rng.standard_normal((S, D)).astype(np.float32)
    sy = rng.integers(0, C, size=S).astype(np.int32)

    bank = ShardedSupportBank.build(s, sy, mesh, C, use_prepared=True)
    assert bank.prepared is not None and bank.feat is None
    got = np.asarray(bank.predict_fn()(
        jax.device_put(jnp.asarray(q), NamedSharding(mesh, P("data")))
    ))
    want = np.asarray(nw_log_probs(jnp.asarray(q), jnp.asarray(s), jnp.asarray(sy), C))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_sharded_prepared_kernel_variants_and_clip(rng):
    """All five fused kernels through the prepared sharded path, including
    clip's runtime logit_scale."""
    mesh = make_mesh(2, 4)
    B, S, D, C = 4, 260, 16, 5
    q = rng.standard_normal((B, D)).astype(np.float32)
    s = rng.standard_normal((S, D)).astype(np.float32)
    sy = rng.integers(0, C, size=S).astype(np.int32)
    for kernel in ["euclidean", "hypersphere_euclidean", "cosine",
                   "dotproduct", "clip"]:
        kparams = {"logit_scale": jnp.float32(1.3)} if kernel == "clip" else None
        bank = ShardedSupportBank.build(s, sy, mesh, C, kernel=kernel,
                                        use_prepared=True)
        got = np.asarray(bank.predict_fn(kernel_params=kparams)(jnp.asarray(q)))
        want = np.asarray(nw_log_probs(
            jnp.asarray(q), jnp.asarray(s), jnp.asarray(sy), C,
            kernel=kernel, kernel_params=kparams,
        ))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4, err_msg=kernel)


@pytest.mark.parametrize("precision", ["f32", "int8"])
def test_sharded_prepared_windowed_large_c(rng, precision):
    """C > 128 sharded prepared banks carry class windows with ONE static
    width across shards (each shard's window widened to the max and starts
    clamped), and the windowed per-shard kernel still merges exactly."""
    mesh = make_mesh(2, 4)
    B, S, D, C = 4, 700, 32, 300  # c_pad = 384
    q = rng.standard_normal((B, D)).astype(np.float32)
    s = rng.standard_normal((S, D)).astype(np.float32)
    # Skew labels so per-tile class spans are narrow post-sort.
    sy = np.sort(rng.integers(0, C, size=S)).astype(np.int32)

    bank = ShardedSupportBank.build(s, sy, mesh, C, precision=precision,
                                    use_prepared=True)
    win = bank.prepared.win
    assert win is not None, "large-C sharded bank should be windowed"
    assert win.shape[1] * 128 < 384  # narrower than full width
    got = np.asarray(bank.predict_fn()(jnp.asarray(q)))
    want = np.asarray(nw_log_probs(jnp.asarray(q), jnp.asarray(s),
                                   jnp.asarray(sy), C))
    tol = 1e-4 if precision == "f32" else 0.1
    np.testing.assert_allclose(np.exp(got).sum(-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(got, want, rtol=tol, atol=max(tol, 1e-4))


def test_sharded_prepared_window_dropped_when_full_width(rng):
    """Uniform random labels over a large C make every tile's span full
    width — the sharded build must fall back to the plain aggregation
    (win=None) and stay exact."""
    mesh = make_mesh(4, 2)
    B, S, D, C = 4, 400, 16, 200
    q = rng.standard_normal((B, D)).astype(np.float32)
    s = rng.standard_normal((S, D)).astype(np.float32)
    # Every tile sees both class extremes -> window width == c_pad.
    sy = np.tile([0, C - 1], S // 2).astype(np.int32)

    bank = ShardedSupportBank.build(s, sy, mesh, C, use_prepared=True)
    assert bank.prepared.win is None
    got = np.asarray(bank.predict_fn()(jnp.asarray(q)))
    want = np.asarray(nw_log_probs(jnp.asarray(q), jnp.asarray(s),
                                   jnp.asarray(sy), C))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_sharded_prepared_bank_precisions(rng):
    """bf16 and int8 sharded banks merge exactly like their single-device
    prepared counterparts (sharding introduces no extra quantization error)."""
    from nwhead_tpu.ops.pallas_nw import nw_fused_log_probs, prepare_support

    mesh = make_mesh(2, 4)
    B, S, D, C = 4, 512, 32, 5
    q = rng.standard_normal((B, D)).astype(np.float32)
    s = rng.standard_normal((S, D)).astype(np.float32)
    sy = rng.integers(0, C, size=S).astype(np.int32)

    want_f32 = np.asarray(nw_log_probs(jnp.asarray(q), jnp.asarray(s), jnp.asarray(sy), C))
    for precision, tol in [("bf16", 0.1), ("int8", 0.1), ("int4", 0.25)]:
        bank = ShardedSupportBank.build(s, sy, mesh, C, precision=precision,
                                        use_prepared=True)
        assert jnp.dtype(bank.prepared.s.dtype) == jnp.dtype(
            {"bf16": jnp.bfloat16, "int8": jnp.int8,
             "int4": jnp.uint8}[precision])
        got = np.asarray(bank.predict_fn()(jnp.asarray(q)))
        # Coarse agreement with f32 (quantization), exact probability mass.
        np.testing.assert_allclose(np.exp(got).sum(-1), 1.0, rtol=1e-5)
        np.testing.assert_allclose(got, want_f32, rtol=tol, atol=0.05,
                                   err_msg=precision)


def test_nwnet_mesh_bf16_head_uses_prepared_bank(rng):
    """NWNet(mesh=..., head_precision='bf16'): precompute must build the
    PREPARED sharded bank (bf16 shards) and full-mode predictions must
    track the unsharded f32 pipeline."""
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

    ds = make_synthetic_dataset(n=40, n_classes=4, size=8, seed=0)
    mesh = make_mesh(2, 4)
    net = NWNet(Tiny(), n_classes=4, support_dataset=ds, feat_dim=16,
                n_shot=1, n_shot_full=5, seed=0, mesh=mesh,
                head_precision="bf16")
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(ds.gather(np.arange(2))))
    net.precompute(variables)
    assert net.sharded_bank.prepared is not None
    assert jnp.dtype(net.sharded_bank.prepared.s.dtype) == jnp.bfloat16

    x = jnp.asarray(ds.gather(np.arange(4)))
    got = np.asarray(net.predict(variables, x, "full"))

    net_ref = NWNet(Tiny(), n_classes=4, support_dataset=ds, feat_dim=16,
                    n_shot=1, n_shot_full=5, seed=0)
    net_ref.precompute(variables)
    want = np.asarray(net_ref.predict(variables, x, "full"))
    np.testing.assert_allclose(np.exp(got), np.exp(want), rtol=0.1, atol=0.05)


def test_sharded_precision_requires_prepared(rng):
    mesh = make_mesh(2, 4)
    s = rng.standard_normal((64, 16)).astype(np.float32)
    sy = rng.integers(0, 4, size=64).astype(np.int32)
    with pytest.raises(ValueError, match="prepared"):
        ShardedSupportBank.build(s, sy, mesh, 4, precision="bf16",
                                 use_prepared=False)


def test_data_parallel_train_step(rng):
    """One NW training step with the batch sharded over 8 devices — grads
    come back replicated and finite (XLA inserts the reductions)."""
    import flax.linen as nn
    import optax

    from nwhead_tpu.nw.net import NWModel

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = True):
            x = nn.Conv(8, (3, 3), padding="SAME")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
            x = nn.relu(x)
            x = jnp.mean(x, axis=(1, 2))
            return nn.Dense(16)(x)

    mesh = make_mesh(8, 1)
    model = NWModel(featurizer=Tiny(), n_classes=4)

    B, S = 16, 8
    qimg = rng.standard_normal((B, 8, 8, 3)).astype(np.float32)
    simg = rng.standard_normal((S, 8, 8, 3)).astype(np.float32)
    sy = rng.integers(0, 4, size=S).astype(np.int32)
    qy = rng.integers(0, 4, size=B).astype(np.int32)

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(qimg), jnp.asarray(simg), jnp.asarray(sy), train=False)
    tx = optax.sgd(0.1, momentum=0.9, nesterov=True)
    opt_state = tx.init(variables["params"])

    data_shard = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    @jax.jit
    def step(params, batch_stats, opt_state, qimg, qy, simg, sy):
        def loss_fn(p):
            lp, upd = model.apply(
                {"params": p, "batch_stats": batch_stats},
                qimg, simg, sy, train=True, mutable=["batch_stats"],
            )
            picked = jnp.take_along_axis(lp, qy[:, None], axis=-1)
            return -jnp.mean(picked), upd["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, new_opt, loss

    qimg_d = jax.device_put(jnp.asarray(qimg), data_shard)
    qy_d = jax.device_put(jnp.asarray(qy), data_shard)
    simg_d = jax.device_put(jnp.asarray(simg), repl)
    sy_d = jax.device_put(jnp.asarray(sy), repl)

    new_params, new_stats, new_opt, loss = step(
        variables["params"], variables["batch_stats"], opt_state,
        qimg_d, qy_d, simg_d, sy_d,
    )
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(new_params)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)


def test_nwnet_with_mesh_full_mode(rng):
    """NWNet(mesh=...) must produce identical full-mode predictions through
    the sharded bank as without a mesh."""
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

    ds = make_synthetic_dataset(n=40, n_classes=4, size=8, seed=0)
    mesh = make_mesh(2, 4)

    def build(mesh_arg):
        net = NWNet(
            Tiny(), n_classes=4, support_dataset=ds, feat_dim=16,
            n_shot=1, n_shot_full=5, seed=0, mesh=mesh_arg,
        )
        variables = net.init(jax.random.PRNGKey(0), jnp.asarray(ds.gather(np.arange(2))))
        net.precompute(variables)
        return net, variables

    net_s, var_s = build(mesh)
    net_u, var_u = build(None)
    assert net_s.sharded_bank is not None and net_u.sharded_bank is None

    x = jnp.asarray(ds.gather(np.arange(4)))
    got = np.asarray(net_s.predict(var_s, x, "full"))
    want = np.asarray(net_u.predict(var_u, x, "full"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_nwnet_with_mesh_ensemble_mode(rng):
    """Ensemble mode under a mesh shards every env bank's support axis and
    merges per-env online-softmax partials (exact) — it must match the
    single-device stacked-bank scan bit-for-bit semantics, including
    uneven per-env sizes (padding rows masked) and a support axis that
    does not divide the shard count."""
    import flax.linen as nn

    from nwhead_tpu.data import make_synthetic_dataset
    from nwhead_tpu.nw.net import NWNet

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = True):
            x = nn.Conv(8, (3, 3), padding="SAME")(x)
            x = nn.relu(x)
            x = jnp.mean(x, axis=(1, 2))
            return nn.Dense(16)(x)

    ds = make_synthetic_dataset(n=42, n_classes=3, size=8, seed=0)
    # Three environments of uneven sizes -> uneven per-env banks.
    env = np.concatenate([np.zeros(10), np.ones(15), np.full(17, 2)]).astype(int)
    mesh = make_mesh(2, 4)

    def build(mesh_arg):
        net = NWNet(
            Tiny(), n_classes=3, support_dataset=ds, feat_dim=16,
            n_shot=1, n_shot_full=7, env_array=env, train_type="irm",
            seed=0, mesh=mesh_arg,
        )
        variables = net.init(
            jax.random.PRNGKey(0), jnp.asarray(ds.gather(np.arange(2)))
        )
        net.precompute(variables)
        return net, variables

    net_s, var_s = build(mesh)
    net_u, var_u = build(None)

    x = jnp.asarray(ds.gather(np.arange(4)))
    got = np.asarray(net_s.predict(var_s, x, "ensemble"))
    want = np.asarray(net_u.predict(var_u, x, "ensemble"))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # The sharded fn is cached and reused on a second predict.
    fn_first = net_s._sharded_ensemble_cache[1]
    _ = net_s.predict(var_s, x, "ensemble")
    assert net_s._sharded_ensemble_cache[1] is fn_first
    # A bank edit rebuilds the stacked banks -> the cache must refresh.
    extra = make_synthetic_dataset(n=4, n_classes=3, size=8, seed=5)
    net_s.add_support(var_s, extra.images, extra.targets, env_id=1)
    got2 = np.asarray(net_s.predict(var_s, x, "ensemble"))
    assert net_s._sharded_ensemble_cache[1] is not fn_first
    assert np.isfinite(got2).all()


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (4, 2)])
def test_sharded_knn_matches_single_device(rng, mesh_shape):
    """Sharded exact-KNN predict (two-stage top-k + multiplicity-weighted
    masked partials) must equal the single-device ExactKNN union support
    through the NW head — including the union-with-duplicates quirk (the
    +ln(count) score fold) and the whole-batch union semantics across
    data shards."""
    from nwhead_tpu.ops.knn import ExactKNN
    from nwhead_tpu.ops.nw import nw_log_probs
    from nwhead_tpu.parallel import sharded_knn_predict_fn
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_data, n_support = mesh_shape
    mesh = make_mesh(n_data, n_support)
    C, S, D, B, k = 5, 96, 16, 8, 4
    feats = rng.standard_normal((S, D)).astype(np.float32)
    labels = rng.integers(0, C, size=S).astype(np.int32)
    # Queries drawn NEAR bank rows so several queries share neighbors ->
    # the union support contains duplicates (the quirk under test).
    q = (feats[rng.integers(0, 12, size=B)]
         + 0.01 * rng.standard_normal((B, D))).astype(np.float32)

    # Single-device reference composition.
    knn = ExactKNN(feats, labels, n_neighbors=k)
    sf_u, sy_u = knn(q)
    want = np.asarray(nw_log_probs(
        jnp.asarray(q), sf_u, jnp.asarray(np.asarray(sy_u), dtype=jnp.int32), C
    ))

    shard = NamedSharding(mesh, P("support"))
    fn = sharded_knn_predict_fn(
        mesh,
        jax.device_put(jnp.asarray(feats), shard),
        jax.device_put(jnp.asarray(labels), shard),
        jax.device_put(jnp.ones(S, jnp.float32), shard),
        C, k,
    )
    got = np.asarray(fn(
        jax.device_put(jnp.asarray(q), NamedSharding(mesh, P("data")))
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("kernel", ["cosine", "clip"])
def test_sharded_knn_kernel_variants(rng, kernel):
    """The neighbor SEARCH is always L2 (the reference's index metric,
    utils.py:187) but the NW head over the union uses the configured
    kernel — cosine and clip (learnable scale) must match the
    single-device composition."""
    from nwhead_tpu.ops.knn import ExactKNN
    from nwhead_tpu.ops.nw import nw_log_probs
    from nwhead_tpu.parallel import sharded_knn_predict_fn
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(2, 4)
    C, S, D, B, k = 4, 64, 16, 8, 3
    feats = rng.standard_normal((S, D)).astype(np.float32)
    labels = rng.integers(0, C, size=S).astype(np.int32)
    q = rng.standard_normal((B, D)).astype(np.float32)
    kparams = (
        {"logit_scale": jnp.float32(np.log(1 / 0.07))}
        if kernel == "clip" else None
    )

    knn = ExactKNN(feats, labels, n_neighbors=k)
    sf_u, sy_u = knn(q)
    want = np.asarray(nw_log_probs(
        jnp.asarray(q), sf_u, jnp.asarray(np.asarray(sy_u), dtype=jnp.int32),
        C, kernel=kernel, kernel_params=kparams or {},
    ))

    shard = NamedSharding(mesh, P("support"))
    fn = sharded_knn_predict_fn(
        mesh,
        jax.device_put(jnp.asarray(feats), shard),
        jax.device_put(jnp.asarray(labels), shard),
        jax.device_put(jnp.ones(S, jnp.float32), shard),
        C, k, kernel=kernel, kernel_params=kparams,
    )
    got = np.asarray(fn(
        jax.device_put(jnp.asarray(q), NamedSharding(mesh, P("data")))
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_sharded_knn_masked_rows_never_enter_union(rng):
    """When shards back-fill their local top-k with -inf masked/padding
    candidates (fewer than k valid rows on a shard — or even globally),
    those rows must never reach the union: a masked row's label class must
    stay at the log floor, not acquire real probability mass."""
    from nwhead_tpu.parallel import sharded_knn_predict_fn
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(1, 2, devices=jax.devices()[:2])
    C, D, k = 4, 8, 8  # k exceeds the 6 valid rows -> forced back-fill
    feats = np.zeros((16, D), np.float32)
    labels = np.zeros(16, np.int32)  # masked rows carry label 0
    mask = np.zeros(16, np.float32)
    valid = [1, 3, 5, 8, 10, 12]
    for i, row in enumerate(valid):
        feats[row] = rng.standard_normal(D)
        labels[row] = 1 + (i % 3)  # valid labels are 1..3, never 0
        mask[row] = 1.0
    q = rng.standard_normal((2, D)).astype(np.float32)

    shard = NamedSharding(mesh, P("support"))
    fn = sharded_knn_predict_fn(
        mesh,
        jax.device_put(jnp.asarray(feats), shard),
        jax.device_put(jnp.asarray(labels), shard),
        jax.device_put(jnp.asarray(mask), shard),
        C, k,
    )
    got = np.asarray(fn(
        jax.device_put(jnp.asarray(q), NamedSharding(mesh, P("data")))
    ))
    # Class 0 only labels masked rows: it must sit at the 1e-12 log floor.
    assert (got[:, 0] < -20).all(), got[:, 0]
    np.testing.assert_allclose(np.exp(got[:, 1:]).sum(-1), 1.0, rtol=1e-5)


def test_nwnet_with_mesh_knn_mode(rng):
    """NWNet(mesh=...).predict(..., 'knn') routes through the sharded KNN
    path (raw-mode bank) and must equal the meshless single-device result."""
    import flax.linen as nn

    from nwhead_tpu.data import make_synthetic_dataset
    from nwhead_tpu.nw.net import NWNet

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = True):
            x = nn.Conv(8, (3, 3), padding="SAME")(x)
            x = nn.relu(x)
            x = jnp.mean(x, axis=(1, 2))
            return nn.Dense(16)(x)

    ds = make_synthetic_dataset(n=40, n_classes=4, size=8, seed=0)
    mesh = make_mesh(2, 4)

    def build(mesh_arg):
        net = NWNet(
            Tiny(), n_classes=4, support_dataset=ds, feat_dim=16,
            n_shot=1, n_shot_full=10, n_neighbors=3, seed=0, mesh=mesh_arg,
        )
        variables = net.init(
            jax.random.PRNGKey(0), jnp.asarray(ds.gather(np.arange(2)))
        )
        net.precompute(variables)
        return net, variables

    net_s, var_s = build(mesh)
    net_u, var_u = build(None)
    assert net_s.sharded_bank is not None and net_s.sharded_bank.feat is not None

    x = jnp.asarray(ds.gather(np.arange(8)))
    got = np.asarray(net_s.predict(var_s, x, "knn"))
    want = np.asarray(net_u.predict(var_u, x, "knn"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    assert net_s._sharded_knn_cache is not None  # routed through the mesh path
    # Under a mesh the full bank stays HOST-side (steady-state device HBM
    # holds only the shards); the host exact-KNN fallback must agree too.
    assert isinstance(net_s.support_eval.full_feat, np.ndarray)
    assert net_s.support_eval.knn.host
    sf_h, sy_h = net_s.support_eval.knn(np.asarray(net_u._featurize_eval(var_u, x)))
    sf_d, sy_d = net_u.support_eval.knn(np.asarray(net_u._featurize_eval(var_u, x)))
    np.testing.assert_allclose(np.asarray(sf_h), np.asarray(sf_d), atol=1e-6)
    np.testing.assert_array_equal(sy_h, sy_d)


def test_make_serving_fn_under_mesh(rng):
    """make_serving_fn with a mesh attached routes through the sharded
    full-mode predict (there is no prepared bank under a mesh) and must
    match predict(..., 'full') — with and without uint8 normalization."""
    import flax.linen as nn

    from nwhead_tpu.data import make_synthetic_dataset
    from nwhead_tpu.nw.net import NWNet

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = True):
            x = nn.Conv(8, (3, 3), padding="SAME")(x)
            x = nn.relu(x)
            x = jnp.mean(x, axis=(1, 2))
            return nn.Dense(16)(x)

    ds = make_synthetic_dataset(n=32, n_classes=4, size=8, seed=0)
    mesh = make_mesh(2, 4)
    net = NWNet(
        Tiny(), n_classes=4, support_dataset=ds, feat_dim=16,
        n_shot=1, n_shot_full=8, seed=0, mesh=mesh,
    )
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(ds.gather(np.arange(2))))
    net.precompute(variables)
    assert net._prepared_full is None and net._sharded_predict is not None

    x = jnp.asarray(ds.gather(np.arange(4)))
    serve = net.make_serving_fn(variables)
    np.testing.assert_allclose(
        np.asarray(serve(x)), np.asarray(net.predict(variables, x, "full")),
        rtol=1e-5, atol=1e-6,
    )
    # uint8 path: serving fn normalizes on device.
    mean, std = (0.5, 0.5, 0.5), (0.25, 0.25, 0.25)
    u8 = (np.asarray(x) * 255).astype(np.uint8)
    serve_u8 = net.make_serving_fn(variables, normalize=(mean, std))
    manual = (np.asarray(u8).astype(np.float32) / 255.0 - np.asarray(mean)) / np.asarray(std)
    np.testing.assert_allclose(
        np.asarray(serve_u8(jnp.asarray(u8))),
        np.asarray(net.predict(variables, jnp.asarray(manual), "full")),
        rtol=1e-4, atol=1e-5,
    )
    # Live bank pickup: an edit rebuilds the sharded bank and the SAME
    # closure must serve the new bank on its next call (the old one would
    # both answer stale and pin the retired shards).
    extra = make_synthetic_dataset(n=8, n_classes=4, size=8, seed=9)
    net.add_support(variables, extra.images, extra.targets)
    np.testing.assert_allclose(
        np.asarray(serve(x)),
        np.asarray(net.predict(variables, x, "full")),
        rtol=1e-5, atol=1e-6,
    )


def test_sync_batchnorm_matches_single_device(rng):
    """bn_axis_name='data' inside shard_map: per-device BN stats reduced
    across the mesh must equal single-device full-batch BN."""
    from nwhead_tpu.models import load_model

    mesh = make_mesh(8, 1)
    model = load_model("CIFAR_ResNet10", bn_axis_name="data")
    model_ref = load_model("CIFAR_ResNet10")

    x = rng.standard_normal((16, 32, 32, 3)).astype(np.float32)
    variables = model_ref.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]), train=False)

    want = np.asarray(model_ref.apply(variables, jnp.asarray(x), train=True,
                                      mutable=["batch_stats"])[0])

    def local(v, xs):
        out, _ = model.apply(v, xs, train=True, mutable=["batch_stats"])
        return out

    mapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P("data")),
        out_specs=P("data"),
    )
    got = np.asarray(mapped(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


def test_mesh_aware_trainer_end_to_end(rng):
    """NWTrainer(mesh=...): data-parallel episodic training + support-sharded
    full-mode eval on the virtual 8-device mesh, end to end."""
    import flax.linen as nn

    from nwhead_tpu.data import make_synthetic_dataset
    from nwhead_tpu.nw.net import NWNet
    from nwhead_tpu.train import NWTrainer

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = True):
            x = nn.Conv(8, (3, 3), padding="SAME")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
            x = nn.relu(x)
            x = jnp.mean(x, axis=(1, 2))
            return nn.Dense(16)(x)

    mesh = make_mesh(4, 2)
    train_ds = make_synthetic_dataset(n=48, n_classes=4, size=8, seed=0)
    val_ds = make_synthetic_dataset(n=16, n_classes=4, size=8, seed=1)
    net = NWNet(
        Tiny(), n_classes=4, support_dataset=train_ds, feat_dim=16,
        n_shot=1, n_way=4, n_shot_full=5, seed=0, mesh=mesh,
    )
    trainer = NWTrainer(
        net, train_ds, val_ds, lr=0.05, batch_size=4, milestones=(100,),
        eval_modes=("full",), seed=0, mesh=mesh,
    )
    for _ in range(5):
        trainer.train_epoch()
        trainer.reset_metrics()
    acc = trainer.eval_all_modes()
    assert net.sharded_bank is not None  # full mode went through the mesh
    assert acc > 60.0, acc


def test_distributed_precompute_matches_single_device(rng):
    """With a mesh attached, the bank featurization shards over all devices
    and must produce the same features."""
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

    ds = make_synthetic_dataset(n=40, n_classes=4, size=8, seed=0)

    def build(mesh_arg):
        net = NWNet(Tiny(), n_classes=4, support_dataset=ds, feat_dim=16,
                    n_shot=1, n_shot_full=5, seed=0, mesh=mesh_arg,
                    precompute_batch=16)
        v = net.init(jax.random.PRNGKey(0), jnp.asarray(ds.gather(np.arange(2))))
        net.precompute(v)
        return np.asarray(net.full_feat)

    mesh = make_mesh(4, 2)
    np.testing.assert_allclose(build(mesh), build(None), rtol=1e-5, atol=1e-5)


def test_model_axis_tensor_parallel_dense(rng):
    """The ('data','support','model') mesh's TP axis: a Dense kernel sharded
    over 'model' (column-parallel) produces the same output as unsharded,
    with each device holding a feature-dim slice (SURVEY.md §2.5 TP row)."""
    from nwhead_tpu.parallel import model_sharding, make_mesh

    mesh = make_mesh(2, 2, n_model=2)
    assert dict(mesh.shape) == {"data": 2, "support": 2, "model": 2}

    B, D_in, D_out = 8, 32, 64
    x = rng.standard_normal((B, D_in)).astype(np.float32)
    w = rng.standard_normal((D_in, D_out)).astype(np.float32)

    w_tp = jax.device_put(jnp.asarray(w), model_sharding(mesh))
    x_dp = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data")))
    y = jax.jit(lambda a, b: a @ b)(x_dp, w_tp)
    # Output feature dim stays sharded over 'model' (column-parallel Dense).
    np.testing.assert_allclose(np.asarray(y), x @ w, rtol=1e-4, atol=1e-4)


def test_make_mesh_default_model_axis():
    """2-arg make_mesh keeps working: size-1 model axis by default."""
    mesh = make_mesh(4, 2)
    assert dict(mesh.shape) == {"data": 4, "support": 2, "model": 1}


def test_multichip_bench_smoke():
    """scripts/multichip_bench.py runs its full measurement path on the
    virtual CPU mesh (the harness that fires on real multi-chip hardware)
    and reports every scaling field."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "multichip_bench",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "multichip_bench.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    report = mod.main(["--cpu", "8", "--tiny"])
    for key in ("predict_qps_1dev", "predict_qps_ndev",
                "predict_scaling_efficiency", "train_ms_1dev",
                "train_ms_ndev", "train_scaling_efficiency"):
        assert key in report, key
    assert report["devices"] == 8
    assert report["predict_qps_ndev"] > 0


def test_randomized_sharded_prepared_sweep(rng):
    """Property sweep over the sharded prepared predict: random S/D/C,
    precision, mesh split, label skew (windowed vs full-width fallback),
    and mask patterns must all match the naive single-device op. Shard
    boundaries, per-shard padding, cross-shard window widening, and the
    partials merge are the failure surface."""
    seed_rng = np.random.default_rng(20260819)
    for trial in range(6):
        n_data, n_support = [(1, 8), (2, 4), (4, 2)][trial % 3]
        mesh = make_mesh(n_data, n_support)
        B = int(seed_rng.integers(1, 3)) * n_data * 2
        S = int(seed_rng.integers(150, 900))
        D = int(seed_rng.choice([16, 40, 64]))
        C = int(seed_rng.choice([5, 130, 300]))
        precision = ["f32", "bf16", "int8"][trial % 3]
        skewed = bool(seed_rng.integers(2))

        q = seed_rng.standard_normal((B, D)).astype(np.float32)
        s = seed_rng.standard_normal((S, D)).astype(np.float32)
        if skewed and C > 1:
            # 80% of rows in 10% of classes -> narrow windows post-sort.
            hot = seed_rng.choice(C, size=max(1, C // 10), replace=False)
            sy = np.where(
                seed_rng.random(S) < 0.8,
                seed_rng.choice(hot, size=S),
                seed_rng.integers(0, C, size=S),
            ).astype(np.int32)
        else:
            sy = seed_rng.integers(0, C, size=S).astype(np.int32)

        bank = ShardedSupportBank.build(
            s, sy, mesh, C, precision=precision, use_prepared=True
        )
        got = np.asarray(bank.predict_fn()(jnp.asarray(q)))
        want = np.asarray(
            nw_log_probs(jnp.asarray(q), jnp.asarray(s), jnp.asarray(sy), C)
        )
        tag = (f"trial={trial} mesh={n_data}x{n_support} B={B} S={S} D={D} "
               f"C={C} prec={precision} skewed={skewed}")
        np.testing.assert_allclose(
            np.exp(got).sum(-1), 1.0, rtol=1e-5, err_msg=tag
        )
        if precision == "f32":
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4,
                                       err_msg=tag)
        else:
            # Quantized banks: probabilities near-equal, decisions equal.
            np.testing.assert_allclose(
                np.exp(got), np.exp(want), rtol=0.1, atol=0.05, err_msg=tag
            )
            np.testing.assert_array_equal(
                got.argmax(-1), want.argmax(-1), err_msg=tag
            )
