"""End-to-end tests: NW episodic training learns a separable synthetic set,
all inference modes run, influence/neighbors work, checkpoints round-trip,
and the FC baseline trains."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nwhead_tpu.data import make_synthetic_dataset
from nwhead_tpu.models import load_model
from nwhead_tpu.nw.fc import FCNet
from nwhead_tpu.nw.net import NWNet
from nwhead_tpu.train import FCTrainer, NWTrainer


class TinyBackbone:
    """Use the smallest real backbone for e2e speed."""

    @staticmethod
    def make():
        import flax.linen as nn

        class Tiny(nn.Module):
            feat_dim: int = 16

            @nn.compact
            def __call__(self, x, train: bool = True):
                x = nn.Conv(8, (3, 3), padding="SAME")(x)
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
                x = nn.relu(x)
                x = jnp.mean(x, axis=(1, 2))
                return nn.Dense(self.feat_dim)(x)

        return Tiny()


@pytest.fixture(scope="module")
def nw_setup():
    train_ds = make_synthetic_dataset(n=48, n_classes=4, size=8, seed=0)
    val_ds = make_synthetic_dataset(n=16, n_classes=4, size=8, seed=1)
    net = NWNet(
        TinyBackbone.make(),
        n_classes=4,
        support_dataset=train_ds,
        feat_dim=16,
        n_shot=2,
        n_way=3,
        n_shot_full=5,
        n_shot_cluster=2,
        n_neighbors=3,
        seed=0,
    )
    # batch_size must be <= n_way (episodic sampler contract, utils.py:124).
    trainer = NWTrainer(
        net, train_ds, val_ds, lr=0.05, batch_size=3, milestones=(100,), seed=0
    )
    return net, trainer, train_ds, val_ds


def test_nw_training_learns(nw_setup):
    net, trainer, train_ds, val_ds = nw_setup
    for _ in range(6):
        trainer.train_epoch()
    acc = trainer.eval_all_modes()
    # Synthetic classes are separable by mean intensity; a trained NW head
    # must beat chance (25%) decisively in full mode.
    assert acc > 60.0, f"full-mode acc {acc}"


def test_all_predict_modes(nw_setup):
    net, trainer, train_ds, val_ds = nw_setup
    variables = trainer.state.variables()
    net.precompute(variables)
    x = jnp.asarray(val_ds.gather(np.arange(4)))
    for mode in ["random", "full", "cluster", "ensemble", "knn", "hnsw"]:
        out = net.predict(variables, x, mode)
        assert out.shape == (4, 4), mode
        np.testing.assert_allclose(np.exp(np.asarray(out)).sum(-1), 1.0, rtol=1e-4)


def test_return_mask_predict(nw_setup):
    net, trainer, train_ds, val_ds = nw_setup
    net.return_mask = True
    variables = trainer.state.variables()
    net.precompute(variables)
    x = jnp.asarray(val_ds.gather(np.arange(4)))
    out, mask = net.predict(variables, x, "full")
    assert mask.shape == (4,) and mask.all()
    net.return_mask = False


def test_forward_isin_mask(nw_setup):
    net, trainer, train_ds, val_ds = nw_setup
    variables = trainer.state.variables()
    x = jnp.asarray(train_ds.gather(np.arange(3)))
    y = train_ds.targets[:3]
    log_probs, isin, new_stats = net.forward(variables, x, y)
    assert log_probs.shape == (3, 4)
    # n_way sampling guarantees query classes present in support.
    assert isin.all()
    assert new_stats is not None


def test_get_neighbors_and_influence(nw_setup):
    net, trainer, train_ds, val_ds = nw_setup
    variables = trainer.state.variables()
    net.precompute(variables)
    x = jnp.asarray(val_ds.gather(np.arange(2)))
    nbrs = net.get_neighbors(variables, x)
    assert nbrs.shape == (2, len(net.full_y))
    # Most-similar support of a class-0 query should be class 0 (trained net).
    top_label = np.asarray(net.full_y)[nbrs[0, 0]]
    assert top_label == val_ds.targets[0]

    infl = net.support_influence(variables, x, val_ds.targets[:2], mode="full")
    assert infl.shape == (2, len(net.full_y))
    assert np.isfinite(infl).all()
    # Same-class supports should on average help (positive influence).
    same = np.asarray(net.full_y)[None, :] == val_ds.targets[:2][:, None]
    assert infl[same].mean() > infl[~same].mean()


def test_checkpoint_roundtrip(tmp_path, nw_setup):
    from nwhead_tpu.train import latest_checkpoint, load_checkpoint, save_checkpoint

    net, trainer, train_ds, val_ds = nw_setup
    state = {
        "params": trainer.state.params,
        "batch_stats": trainer.state.batch_stats,
        "opt_state": trainer.state.opt_state,
    }
    save_checkpoint(3, state, str(tmp_path), is_best=True)
    path = latest_checkpoint(str(tmp_path))
    assert path and path.endswith("model.0003")
    restored = load_checkpoint(path, target=state)
    assert int(restored["epoch"]) == 3
    chex = jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
            state["params"],
            restored["params"],
        )
    )
    assert chex


def test_fc_baseline_trains():
    train_ds = make_synthetic_dataset(n=48, n_classes=4, size=8, seed=0)
    val_ds = make_synthetic_dataset(n=16, n_classes=4, size=8, seed=1)
    model = FCNet(featurizer=TinyBackbone.make(), num_classes=4)
    trainer = FCTrainer(model, train_ds, val_ds, lr=0.05, batch_size=8, milestones=(100,))
    for _ in range(8):
        trainer.train_epoch()
    acc = trainer.eval_epoch()
    assert acc > 60.0, f"fc acc {acc}"


def test_fc_head_torch_linear_init_conventions():
    """FCHead and the NWNet projection follow torch nn.Linear's default
    init (uniform ±1/sqrt(fan_in) for kernel AND bias — 1/3 the variance
    of flax's lecun_normal), matching the reference's fc.py:19-25 /
    nw.py:74-79 modules; measurably better-calibrated at short budgets."""
    import jax.numpy as jnp

    model = FCNet(featurizer=TinyBackbone.make(), num_classes=64)
    x = jnp.zeros((2, 8, 8, 3))
    params = model.init(jax.random.PRNGKey(0), x, train=False)["params"]
    kernel = np.asarray(params["classifier"]["fc"]["kernel"])
    bias = np.asarray(params["classifier"]["fc"]["bias"])
    fan_in = kernel.shape[0]
    bound = 1.0 / np.sqrt(fan_in)
    for arr in (kernel, bias):
        assert np.abs(arr).max() <= bound + 1e-7
    # Uniform on ±bound: std ≈ bound/sqrt(3), and the bias is NOT zeros
    # (flax's default) — both distinguish the torch convention.
    assert abs(kernel.std() - bound / np.sqrt(3)) < 0.15 * bound
    assert np.abs(bias).max() > 0

    net = NWNet(
        TinyBackbone.make(), n_classes=4,
        support_dataset=make_synthetic_dataset(n=16, n_classes=4, size=8, seed=0),
        feat_dim=16, proj_dim=8, seed=0,
    )
    variables = net.init(jax.random.PRNGKey(0), x)
    pk = np.asarray(variables["params"]["proj"]["kernel"])
    pb = np.asarray(variables["params"]["proj"]["bias"])
    pbound = 1.0 / np.sqrt(pk.shape[0])
    assert np.abs(pk).max() <= pbound + 1e-7
    assert np.abs(pb).max() <= pbound + 1e-7 and np.abs(pb).max() > 0


def test_irm_training_runs():
    train_ds = make_synthetic_dataset(n=48, n_classes=3, size=8, seed=0)
    env = np.tile([0, 1], 24)
    net = NWNet(
        TinyBackbone.make(),
        n_classes=3,
        support_dataset=train_ds,
        feat_dim=16,
        train_type="irm",
        n_shot=2,
        env_array=env,
        seed=0,
    )
    val_ds = make_synthetic_dataset(n=12, n_classes=3, size=8, seed=1)
    trainer = NWTrainer(
        net, train_ds, val_ds, lr=0.05, batch_size=3, milestones=(100,),
        eval_modes=("random", "full", "ensemble"), seed=0,
    )
    trainer.train_epoch(num_steps=4)
    acc = trainer.eval_all_modes(num_steps=2)
    assert np.isfinite(acc)


def test_per_query_support_images():
    """Legacy 5-D per-batch-item support path (legacy/model/net.py:34-42):
    each query gets its own support episode of images."""
    from nwhead_tpu.nw.net import NWModel

    model = NWModel(featurizer=TinyBackbone.make(), n_classes=3)
    rng = np.random.default_rng(0)
    B, S = 2, 6
    qx = jnp.asarray(rng.standard_normal((B, 8, 8, 3)).astype(np.float32))
    sx = jnp.asarray(rng.standard_normal((B, S, 8, 8, 3)).astype(np.float32))
    sy = jnp.asarray(rng.integers(0, 3, size=(B, S)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), qx, sx, sy, train=False)
    out = model.apply(variables, qx, sx, sy, train=False)
    assert out.shape == (B, 3)
    np.testing.assert_allclose(np.exp(np.asarray(out)).sum(-1), 1.0, rtol=1e-4)

    # Per-query result must equal running each item separately vs its own
    # shared support (eval mode avoids cross-item BN coupling).
    for b in range(B):
        solo = model.apply(variables, qx[b : b + 1], sx[b], sy[b], train=False)
        np.testing.assert_allclose(
            np.asarray(out[b : b + 1]), np.asarray(solo), rtol=1e-3, atol=1e-4
        )


def test_ensemble_device_resident_parity():
    """Device-resident stacked ensemble banks (padded + masked) must equal
    the per-env loop: mean over envs of exp(NW log-probs), in prob space
    (``nw.py:143-154``) — including with UNEVEN env sizes."""
    from nwhead_tpu.ops.nw import nw_log_probs

    train_ds = make_synthetic_dataset(n=45, n_classes=3, size=8, seed=3)
    # Uneven envs: 21 / 24 items -> padding path in the stacked banks.
    env_array = np.array([0] * 21 + [1] * 24)
    net = NWNet(
        TinyBackbone.make(),
        n_classes=3,
        support_dataset=train_ds,
        feat_dim=16,
        n_shot=2,
        n_shot_full=10,
        env_array=env_array,
        seed=0,
    )
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(train_ds.gather(np.arange(2))))
    net.precompute(variables)

    x = jnp.asarray(train_ds.gather(np.arange(4)))
    got = np.asarray(net.predict(variables, x, "ensemble"))

    qfeat = net._featurize_eval(variables, x)
    total = 0.0
    for f, y in zip(net.support_eval.full_feat_sep, net.support_eval.full_y_sep):
        lp = nw_log_probs(qfeat, jnp.asarray(f), jnp.asarray(y), 3)
        total = total + np.exp(np.asarray(lp))
    want = np.log(total / len(net.support_eval.full_feat_sep))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ensemble_predict_no_host_transfer(nw_setup):
    """After precompute, the stacked ensemble banks are device arrays and a
    second predict call reuses the same compiled function (same shapes)."""
    net, trainer, train_ds, val_ds = nw_setup
    variables = trainer.state.variables()
    net.precompute(variables)
    assert net.support_eval._ensemble_cache is None  # built lazily
    x = jnp.asarray(val_ds.gather(np.arange(4)))
    out1 = net.predict(variables, x, "ensemble")
    ens_feat, _, _ = net.support_eval._ensemble_cache
    assert isinstance(ens_feat, jnp.ndarray)  # device-resident, cached
    out2 = net.predict(variables, x, "ensemble")
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))


def test_full_mode_prepared_bank_parity():
    """With a large-enough bank, full-mode predict routes through the
    prepared serving bank (prepare once, stream per call) and must equal the
    naive head exactly."""
    from nwhead_tpu.ops.nw import nw_log_probs

    train_ds = make_synthetic_dataset(n=48, n_classes=4, size=8, seed=5)
    net = NWNet(
        TinyBackbone.make(),
        n_classes=4,
        support_dataset=train_ds,
        feat_dim=16,
        n_shot=2,
        n_shot_full=12,
        fused_min_support=1,  # bank of 48 rows routes through the fused path
        seed=0,
    )
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(train_ds.gather(np.arange(2))))
    net.precompute(variables)
    assert net._prepared_full is not None

    x = jnp.asarray(train_ds.gather(np.arange(4)))
    got = np.asarray(net.predict(variables, x, "full"))

    qfeat = net._featurize_eval(variables, x)
    want = np.asarray(nw_log_probs(qfeat, net.full_feat, net.full_y, 4))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_make_serving_fn_one_dispatch_parity():
    """make_serving_fn (ONE jitted normalize->featurize->prepared-head
    dispatch per request) must agree exactly with the multi-dispatch
    predict path, for float inputs and for uint8 inputs with on-device
    normalization folded into the same jit."""
    train_ds = make_synthetic_dataset(n=48, n_classes=4, size=8, seed=5)
    net = NWNet(
        TinyBackbone.make(),
        n_classes=4,
        support_dataset=train_ds,
        feat_dim=16,
        n_shot=2,
        n_shot_full=12,
        fused_min_support=1,
        seed=0,
    )
    variables = net.init(
        jax.random.PRNGKey(0), jnp.asarray(train_ds.gather(np.arange(2)))
    )

    # Prepared bank is a precondition — before precompute it must refuse.
    with pytest.raises(ValueError, match="prepared"):
        net.make_serving_fn(variables)

    net.precompute(variables)
    assert net._prepared_full is not None

    x = jnp.asarray(train_ds.gather(np.arange(4)))
    want = np.asarray(net.predict(variables, x, "full"))
    serve = net.make_serving_fn(variables)
    np.testing.assert_allclose(np.asarray(serve(x)), want, rtol=1e-6)

    # uint8 + in-jit normalize == normalize-on-host then float path.
    mean, std = (0.5, 0.4, 0.3), (0.2, 0.25, 0.3)
    u8 = np.random.default_rng(0).integers(
        0, 256, x.shape, dtype=np.uint8
    )
    xf = (u8.astype(np.float32) / 255.0 - np.asarray(mean, np.float32)) / (
        np.asarray(std, np.float32)
    )
    want8 = np.asarray(net.predict(variables, jnp.asarray(xf), "full"))
    serve8 = net.make_serving_fn(variables, normalize=(mean, std))
    np.testing.assert_allclose(
        np.asarray(serve8(jnp.asarray(u8))), want8, rtol=1e-5, atol=1e-6
    )


def test_clip_kernel_prepared_full_mode():
    """Regression: clip's learnable logit_scale must be readable from the
    prepared serving path (the param now lives in NWHead.setup, not inline
    in a compact __call__) — full-mode predict with kernel_type='clip' and a
    prepared bank must equal the naive head."""
    from nwhead_tpu.ops.nw import nw_log_probs

    train_ds = make_synthetic_dataset(n=48, n_classes=4, size=8, seed=7)
    net = NWNet(
        TinyBackbone.make(),
        n_classes=4,
        support_dataset=train_ds,
        feat_dim=16,
        n_shot=2,
        n_shot_full=12,
        kernel_type="clip",
        fused_min_support=1,
        seed=0,
    )
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(train_ds.gather(np.arange(2))))
    net.precompute(variables)
    assert net._prepared_full is not None

    x = jnp.asarray(train_ds.gather(np.arange(4)))
    got = np.asarray(net.predict(variables, x, "full"))

    qfeat = net._featurize_eval(variables, x)
    kparams = {"logit_scale": variables["params"]["head"]["logit_scale"]}
    want = np.asarray(nw_log_probs(
        qfeat, net.full_feat, net.full_y, 4, kernel="clip", kernel_params=kparams
    ))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_process_support_eval_invalidates_bank_state():
    """Regression: swapping the eval support set must invalidate BOTH the
    prepared serving bank and the sharded bank, so stale-bank predictions
    are impossible."""
    train_ds = make_synthetic_dataset(n=48, n_classes=4, size=8, seed=8)
    net = NWNet(
        TinyBackbone.make(), n_classes=4, support_dataset=train_ds,
        feat_dim=16, n_shot=2, n_shot_full=12, fused_min_support=1, seed=0,
    )
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(train_ds.gather(np.arange(2))))
    net.precompute(variables)
    assert net._prepared_full is not None
    net.sharded_bank = object()  # simulate a built sharded bank

    new_ds = make_synthetic_dataset(n=24, n_classes=4, size=8, seed=9)
    net.process_support_eval(new_ds, n_shot_full=6)
    assert net._prepared_full is None
    assert net.sharded_bank is None
    with pytest.raises(AttributeError, match="precompute"):
        net.support_eval.get_support("full")


@pytest.mark.parametrize("precision,bank_dtype", [
    ("int8", jnp.int8), ("int4", jnp.uint8),
])
def test_quantized_serving_through_nwnet(precision, bank_dtype):
    """head_precision='int8'/'int4' flows into the prepared serving bank:
    predict full-mode runs on the quantized bank and stays argmax-consistent
    with the f32 head on separable data (episodic training stays f32)."""
    train_ds = make_synthetic_dataset(n=48, n_classes=4, size=8, seed=11)

    def build(precision):
        net = NWNet(
            TinyBackbone.make(), n_classes=4, support_dataset=train_ds,
            feat_dim=16, n_shot=2, n_shot_full=12, fused_min_support=1,
            head_precision=precision, seed=0,
        )
        v = net.init(jax.random.PRNGKey(0), jnp.asarray(train_ds.gather(np.arange(2))))
        net.precompute(v)
        return net, v

    netq, vq = build(precision)
    assert netq._prepared_full.s.dtype == bank_dtype
    net32, v32 = build("f32")

    x = jnp.asarray(train_ds.gather(np.arange(8)))
    outq = np.asarray(netq.predict(vq, x, "full"))
    out32 = np.asarray(net32.predict(v32, x, "full"))
    np.testing.assert_array_equal(outq.argmax(-1), out32.argmax(-1))
    assert np.max(np.abs(np.exp(outq) - np.exp(out32))) < 0.08


def test_checkpoint_partial_target_restore(tmp_path, nw_setup):
    """eval.py/serve.py restore only params(+batch_stats) from a train.py
    checkpoint that also holds opt_state — orbax refuses the structure
    mismatch, so load_checkpoint must fall back to a raw restore and
    subtree selection (regression: the --ckpt CLIs crashed on every real
    training checkpoint before this)."""
    from nwhead_tpu.train import load_checkpoint, save_checkpoint

    net, trainer, train_ds, val_ds = nw_setup
    state = {
        "params": trainer.state.params,
        "batch_stats": trainer.state.batch_stats,
        "opt_state": trainer.state.opt_state,
    }
    save_checkpoint(2, state, str(tmp_path), is_best=False)
    partial = {
        "params": trainer.state.params,
        "batch_stats": trainer.state.batch_stats,
    }
    restored = load_checkpoint(str(tmp_path) + "/model.0002", target=partial)
    ok = jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
            partial["params"],
            restored["params"],
        )
    )
    assert ok
    assert "opt_state" not in restored
