"""AOT-exported serving artifacts (``nwhead_tpu/utils/aot.py`` +
``serve.py --export_artifact/--serve_artifact``): the jax.export'd
one-dispatch serving fn must reload WITHOUT model code and reproduce the
live serving fn exactly."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def small_net():
    from nwhead_tpu.data import ArrayDataset
    from nwhead_tpu.models import load_model
    from nwhead_tpu.nw.net import NWNet

    rng = np.random.default_rng(0)
    C, N = 4, 48
    y = np.tile(np.arange(C), N // C)
    x = rng.normal(0, 0.4, size=(N, 32, 32, 3)).astype(np.float32)
    x += (y / C)[:, None, None, None].astype(np.float32)
    ds = ArrayDataset(x, y, num_classes=C)
    net = NWNet(
        load_model("resnet10"), C, support_dataset=ds, feat_dim=512,
        n_shot_full=12, fused_min_support=1, seed=0,
    )
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x[:2]))
    net.precompute(variables)
    return net, variables, x


def test_export_reload_parity_float(small_net, tmp_path):
    from nwhead_tpu.utils.aot import (
        export_serving_artifact,
        load_serving_artifact,
    )

    net, variables, x = small_net
    fn = net.make_serving_fn(variables)
    q = jnp.asarray(x[:6])
    want = np.asarray(fn(q))

    meta = export_serving_artifact(fn, q, str(tmp_path / "art"))
    assert meta["n_operand_leaves"] > 0
    assert meta["input_shape"] == [6, 32, 32, 3]

    reloaded = load_serving_artifact(str(tmp_path / "art"))
    got = np.asarray(reloaded(q))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    assert reloaded.meta["platforms"] == meta["platforms"]


def test_export_reload_parity_int4_bank(tmp_path):
    """An int4 nibble-packed serving bank exports and reloads: the packed
    uint8 bank rides as a stored operand and the in-module bitcast + VPU
    unpack reproduce the live path exactly."""
    from nwhead_tpu.data import ArrayDataset
    from nwhead_tpu.models import load_model
    from nwhead_tpu.nw.net import NWNet
    from nwhead_tpu.utils.aot import (
        export_serving_artifact,
        load_serving_artifact,
    )

    rng = np.random.default_rng(3)
    C, N = 4, 48
    y = np.tile(np.arange(C), N // C)
    x = rng.normal(0, 0.4, size=(N, 32, 32, 3)).astype(np.float32)
    x += (y / C)[:, None, None, None].astype(np.float32)
    ds = ArrayDataset(x, y, num_classes=C)
    net = NWNet(
        load_model("resnet10"), C, support_dataset=ds, feat_dim=512,
        n_shot_full=12, fused_min_support=1, head_precision="int4", seed=0,
    )
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x[:2]))
    net.precompute(variables)
    assert net._prepared_full.s.dtype == jnp.uint8

    fn = net.make_serving_fn(variables)
    q = jnp.asarray(x[:6])
    want = np.asarray(fn(q))
    export_serving_artifact(fn, q, str(tmp_path / "art4"))
    reloaded = load_serving_artifact(str(tmp_path / "art4"))
    got = np.asarray(reloaded(q))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_export_reload_parity_uint8_normalize(small_net, tmp_path):
    """The deployment form: uint8 pixels in, normalization folded into the
    exported module."""
    from nwhead_tpu.data import transforms as T
    from nwhead_tpu.utils.aot import (
        export_serving_artifact,
        load_serving_artifact,
    )

    net, variables, _ = small_net
    fn = net.make_serving_fn(
        variables, normalize=(T.IMAGENET_MEAN, T.IMAGENET_STD)
    )
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.integers(0, 256, size=(3, 32, 32, 3)).astype(np.uint8))
    want = np.asarray(fn(q))

    export_serving_artifact(fn, q, str(tmp_path / "art8"))
    reloaded = load_serving_artifact(str(tmp_path / "art8"))
    np.testing.assert_allclose(np.asarray(reloaded(q)), want,
                               rtol=1e-6, atol=1e-6)


def test_export_rejects_plain_callables(small_net, tmp_path):
    from nwhead_tpu.utils.aot import export_serving_artifact

    with pytest.raises(ValueError, match="make_serving_fn"):
        export_serving_artifact(
            lambda x: x, jnp.ones((2, 2)), str(tmp_path / "bad")
        )


def test_platform_mismatch_refuses(small_net, tmp_path):
    from nwhead_tpu.utils.aot import (
        export_serving_artifact,
        load_serving_artifact,
    )

    net, variables, x = small_net
    fn = net.make_serving_fn(variables)
    export_serving_artifact(fn, jnp.asarray(x[:2]), str(tmp_path / "artp"))
    meta_path = tmp_path / "artp" / "meta.json"
    meta = json.loads(meta_path.read_text())
    meta["platforms"] = ["tpu"]  # pretend it was lowered for the chip
    meta_path.write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="lowered for"):
        load_serving_artifact(str(tmp_path / "artp"))


def test_cli_export_then_serve_artifact(tmp_path):
    """serve.py round trip: --export_artifact writes the artifact, a fresh
    --serve_artifact invocation (no model build) answers a latency bench."""
    import serve

    art = str(tmp_path / "artifact")
    rep = serve.main([
        "--dataset", "synthetic", "--arch", "resnet10",
        "--batch_size", "4", "--n_shot_full", "5",
        "--export_artifact", art,
    ])
    assert rep["exported"] == art
    assert os.path.exists(os.path.join(art, "module.jax_export"))

    out = serve.main([
        "--dataset", "synthetic",  # ignored by the artifact path
        "--serve_artifact", art,
        "--latency_bench", "--bench_batches", "2",
    ])
    assert out["latency"]["batch_size"] == 4
    assert out["latency"]["queries_per_sec"] > 0


def test_export_reload_parity_int8_featurizer(tmp_path):
    """Quantized-CNN serving export: the int8 featurizer's folded weights
    ride inside its closure (baked as module constants — small for CNNs),
    the float variables + prepared bank as stored operands."""
    from nwhead_tpu.data import ArrayDataset
    from nwhead_tpu.models import load_model
    from nwhead_tpu.nw.net import NWNet
    from nwhead_tpu.utils.aot import (
        export_serving_artifact,
        load_serving_artifact,
    )

    rng = np.random.default_rng(3)
    C, N = 3, 24
    y = np.tile(np.arange(C), N // C)
    x = rng.normal(0, 0.4, size=(N, 32, 32, 3)).astype(np.float32)
    x += (y / C)[:, None, None, None].astype(np.float32)
    ds = ArrayDataset(x, y, num_classes=C)
    net = NWNet(load_model("resnet10"), C, support_dataset=ds,
                feat_dim=512, n_shot_full=6, fused_min_support=1, seed=0)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x[:2]))
    net.quantize_featurizer(variables, x[:8])
    net.precompute(variables)

    fn = net.make_serving_fn(variables)
    q = jnp.asarray(x[:4])
    want = np.asarray(fn(q))
    export_serving_artifact(fn, q, str(tmp_path / "arti8"))
    reloaded = load_serving_artifact(str(tmp_path / "arti8"))
    np.testing.assert_allclose(np.asarray(reloaded(q)), want,
                               rtol=1e-6, atol=1e-6)


def test_export_reload_parity_quantized_vit(tmp_path):
    """The QuantizedViT serving export (``serve_q``): its weight tree rides
    as stored operands (never baked — ViT-B constant bodies get rejected
    by the remote compile service), which exercises the NamedTuple
    registrations (QViTBlock/QDense/QLayerNorm) and scalar act-scale
    leaves in the operand pytree."""
    from nwhead_tpu.data import ArrayDataset
    from nwhead_tpu.models import load_model
    from nwhead_tpu.nw.net import NWNet
    from nwhead_tpu.utils.aot import (
        export_serving_artifact,
        load_serving_artifact,
    )

    rng = np.random.default_rng(4)
    C, N = 3, 12
    y = np.tile(np.arange(C), N // C)
    x = rng.normal(0, 0.4, size=(N, 64, 64, 3)).astype(np.float32)
    x += (y / C)[:, None, None, None].astype(np.float32)
    ds = ArrayDataset(x, y, num_classes=C)
    vit = load_model("vit_s16")
    net = NWNet(vit, C, support_dataset=ds, feat_dim=vit.feat_dim,
                n_shot_full=4, fused_min_support=1, seed=0)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x[:2]))
    net.quantize_featurizer(variables, x[:6])
    net.precompute(variables)

    fn = net.make_serving_fn(variables)
    q = jnp.asarray(x[:2])
    want = np.asarray(fn(q))
    meta = export_serving_artifact(fn, q, str(tmp_path / "artvit"))
    # The ViT weight tree must be in the operands, not baked: far more
    # leaves than the CNN path's (variables, prepared) pair.
    assert meta["n_operand_leaves"] > 50
    reloaded = load_serving_artifact(str(tmp_path / "artvit"))
    np.testing.assert_allclose(np.asarray(reloaded(q)), want,
                               rtol=1e-6, atol=1e-6)


@pytest.fixture(scope="module")
def mesh_net():
    import flax.linen as nn

    from nwhead_tpu.data import make_synthetic_dataset
    from nwhead_tpu.nw.net import NWNet
    from nwhead_tpu.parallel.mesh import make_mesh

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
                n_shot=1, n_shot_full=5, fused_min_support=1, seed=0,
                mesh=mesh)
    variables = net.init(
        jax.random.PRNGKey(0), jnp.asarray(ds.gather(np.arange(2))))
    net.precompute(variables)
    return net, variables, ds


def test_mesh_export_reload_parity(mesh_net, tmp_path):
    """Pod-serving artifact: the shard_mapped prepared pipeline exports as
    ONE multi-device module; reloading (mesh rebuilt from the running
    devices) reproduces the live sharded predict exactly. Bank shards ride
    as 'support'-sharded operands, weights replicated."""
    from nwhead_tpu.utils.aot import (
        export_mesh_serving_artifact,
        load_mesh_serving_artifact,
        load_serving_artifact,
    )

    net, variables, ds = mesh_net
    x = jnp.asarray(ds.gather(np.arange(8)))
    want = np.asarray(net.predict(variables, x, "full"))

    art = str(tmp_path / "mesh_art")
    meta = export_mesh_serving_artifact(net, variables, x, art)
    assert meta["nr_devices"] == 8
    assert meta["mesh_axis_names"][:2] == ["data", "support"]

    fn = load_mesh_serving_artifact(art)
    got = np.asarray(fn(np.asarray(x)))
    # The live CPU mesh predict runs the RAW jnp path while the artifact
    # snapshots freshly-built PREPARED shards — same math, different
    # summation order (~1e-4 rel). Decisions and probabilities must agree.
    np.testing.assert_allclose(np.exp(got).sum(-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))

    # Reloading twice must give identical outputs (deterministic module).
    fn2 = load_mesh_serving_artifact(art)
    np.testing.assert_array_equal(np.asarray(fn2(np.asarray(x))), got)

    # The single-device loader must refuse it loudly (and vice versa).
    with pytest.raises(ValueError, match="mesh"):
        load_serving_artifact(art)


def test_mesh_artifact_guards(mesh_net, small_net, tmp_path):
    """Cross-loader and mesh-shape guards."""
    from nwhead_tpu.parallel.mesh import make_mesh
    from nwhead_tpu.utils.aot import (
        export_mesh_serving_artifact,
        export_serving_artifact,
        load_mesh_serving_artifact,
    )

    net, variables, ds = mesh_net
    x = jnp.asarray(ds.gather(np.arange(8)))
    art = str(tmp_path / "m")
    export_mesh_serving_artifact(net, variables, x, art)

    # Wrong mesh shape refused.
    with pytest.raises(ValueError, match="does not match"):
        load_mesh_serving_artifact(art, mesh=make_mesh(4, 2))

    # Mesh loader refuses a single-device artifact.
    snet, svars, sx = small_net
    fn = snet.make_serving_fn(svars)
    sart = str(tmp_path / "s")
    export_serving_artifact(fn, jnp.asarray(sx[:4]), sart)
    with pytest.raises(ValueError, match="single-device"):
        load_mesh_serving_artifact(sart)


def test_cli_mesh_export_then_serve_artifact(tmp_path):
    """serve.py --mesh --export_artifact writes a pod artifact; a fresh
    --serve_artifact invocation auto-detects it and serves."""
    import serve

    art = str(tmp_path / "mesh_artifact")
    rep = serve.main([
        "--dataset", "synthetic", "--arch", "resnet10",
        "--batch_size", "8", "--n_shot_full", "5",
        "--mesh", "2,4",
        "--export_artifact", art,
    ])
    assert rep["exported"] == art
    assert rep["nr_devices"] == 8

    out = serve.main([
        "--dataset", "synthetic",  # ignored by the artifact path
        "--serve_artifact", art,
        "--latency_bench", "--bench_batches", "2",
    ])
    assert out["latency"]["batch_size"] == 8
    assert out["latency"]["queries_per_sec"] > 0


def test_mesh_export_quantized_vit(tmp_path):
    """The quantized-ViT mesh export branch: the weight tree rides as a
    stored operand (NO dead full-float variables tree — it would pickle
    and replicate ViT-scale weights the module never reads), bank shards
    as 'support'; reload matches the live sharded predict."""
    from nwhead_tpu.data import ArrayDataset
    from nwhead_tpu.models import load_model
    from nwhead_tpu.nw.net import NWNet
    from nwhead_tpu.parallel.mesh import make_mesh
    from nwhead_tpu.utils.aot import (
        export_mesh_serving_artifact,
        load_mesh_serving_artifact,
    )

    rng = np.random.default_rng(9)
    C, N = 3, 24
    y = np.tile(np.arange(C), N // C)
    x = rng.normal(0, 0.4, size=(N, 64, 64, 3)).astype(np.float32)
    x += (y / C)[:, None, None, None].astype(np.float32)
    ds = ArrayDataset(x, y, num_classes=C)
    vit = load_model("vit_s16")
    mesh = make_mesh(2, 4)
    net = NWNet(vit, C, support_dataset=ds, feat_dim=vit.feat_dim,
                n_shot_full=8, fused_min_support=1, seed=0, mesh=mesh)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x[:2]))
    net.quantize_featurizer(variables, x[:6])
    net.precompute(variables)

    q = jnp.asarray(x[:8])
    want = np.asarray(net.predict(variables, q, "full"))
    art = str(tmp_path / "mesh_vit")
    meta = export_mesh_serving_artifact(net, variables, q, art)
    assert meta["nr_devices"] == 8

    # No dead float tree: the float params alone would exceed the stored
    # operand byte count if they had been included alongside the q-tree.
    import pickle

    with open(os.path.join(art, "operands.pkl"), "rb") as f:
        blob = pickle.load(f)
    stored = sum(np.asarray(l).nbytes for l in blob["leaves"])
    float_tree = sum(
        np.asarray(l).nbytes
        for l in jax.tree_util.tree_leaves(variables["params"])
    )
    assert stored < 2 * float_tree  # tree is int8-ish + bank, not 2x float

    fn = load_mesh_serving_artifact(art)
    got = np.asarray(fn(np.asarray(q)))
    np.testing.assert_allclose(np.exp(got).sum(-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_export_reload_parity_ivf_mode(small_net, tmp_path):
    """make_serving_fn(mode='ivf') exports: the IVFPrepared operand
    (nested prepared bank + routing index) serializes/reloads and the
    routed module reproduces the live fn exactly — incl. pruned probes."""
    from nwhead_tpu.utils.aot import (
        export_serving_artifact,
        load_serving_artifact,
    )

    net, variables, x = small_net
    net.ivf_n_probe = 10_000  # full probe: routed == exact
    net._ivf_cache = None
    fn = net.make_serving_fn(variables, mode="ivf")
    q = jnp.asarray(x[:6])
    want = np.asarray(fn(q))
    full = np.asarray(net.make_serving_fn(variables)(q))
    np.testing.assert_allclose(
        np.exp(want), np.exp(full), rtol=1e-5, atol=1e-6)

    meta = export_serving_artifact(fn, q, str(tmp_path / "art_ivf"))
    reloaded = load_serving_artifact(str(tmp_path / "art_ivf"))
    got = np.asarray(reloaded(q))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    # Pruned probe: a separate artifact (n_probe is baked into the jit).
    net.ivf_n_probe = 2
    net._ivf_cache = None
    fn2 = net.make_serving_fn(variables, mode="ivf")
    want2 = np.asarray(fn2(q))
    export_serving_artifact(fn2, q, str(tmp_path / "art_ivf2"))
    got2 = np.asarray(load_serving_artifact(str(tmp_path / "art_ivf2"))(q))
    np.testing.assert_allclose(got2, want2, rtol=1e-6, atol=1e-6)
