"""serve.py — the deploy-side CLI: latency bench + file-query paths."""

import json
import os

import numpy as np
import pytest


def test_serve_latency_bench_synthetic():
    import serve

    out = serve.main([
        "--dataset", "synthetic", "--arch", "resnet10",
        "--batch_size", "8", "--n_shot_full", "5",
        "--latency_bench", "--bench_batches", "3",
    ])
    rep = out["latency"]
    assert rep["batches"] == 3 and rep["p50_ms"] > 0
    assert rep["queries_per_sec"] > 0


def test_serve_int8_stack_synthetic():
    import serve

    out = serve.main([
        "--dataset", "synthetic", "--arch", "resnet10",
        "--batch_size", "8", "--n_shot_full", "5",
        "--featurizer_precision", "int8", "--head_precision", "int8",
        "--calib_images", "16",
        "--latency_bench", "--bench_batches", "2",
    ])
    assert out["latency"]["featurizer_precision"] == "int8"


def test_serve_queries_from_files(tmp_path):
    from PIL import Image

    import serve

    rng = np.random.default_rng(0)
    for i in range(3):
        arr = rng.integers(0, 255, size=(48, 48, 3)).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f"q{i}.jpg", quality=90)

    out = serve.main([
        "--dataset", "synthetic", "--arch", "resnet10",
        "--batch_size", "4", "--n_shot_full", "5", "--topk", "2",
        "--queries", str(tmp_path / "*.jpg"),
    ])
    qs = out["queries"]
    assert len(qs) == 3
    for q in qs:
        assert len(q["topk"]) == 2
        assert 0.0 <= q["topk"][0]["prob"] <= 1.0


def test_serve_queries_with_explanations(tmp_path):
    """--explain K attaches the NW head's own evidence to every answer:
    top-K supports by softmax weight, plus leave-one-out influence on the
    predicted class. Influence semantics are checkable in closed form: an
    item helps (influence > 0) iff its label IS the predicted class
    (removing it lowers p), and hurts otherwise — so the most-helpful item
    must carry the predicted label and the most-harmful must not."""
    from PIL import Image

    import serve

    rng = np.random.default_rng(1)
    for i in range(2):
        arr = rng.integers(0, 255, size=(48, 48, 3)).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f"q{i}.jpg", quality=90)

    out = serve.main([
        "--dataset", "synthetic", "--arch", "resnet10",
        "--batch_size", "4", "--n_shot_full", "5", "--topk", "2",
        "--explain", "3",
        "--queries", str(tmp_path / "*.jpg"),
    ])
    qs = out["queries"]
    assert len(qs) == 2
    for q in qs:
        ex = q["explain"]
        # The answer and its explanation come from the same head pass.
        assert q["topk"][0]["class"] == ex["predicted_class"]
        ws = [n["weight"] for n in ex["neighbors"]]
        assert len(ws) == 3 and ws == sorted(ws, reverse=True)
        assert 0.0 < sum(ws) <= 1.0 + 1e-6
        for n in ex["neighbors"]:
            assert "dataset_index" in n  # bank row -> dataset identity
        top_help = ex["helpful"][0]
        assert top_help["label"] == ex["predicted_class"]
        assert top_help["influence"] > 0
        assert ex["most_harmful"]["label"] != ex["predicted_class"]
        assert ex["most_harmful"]["influence"] < 0


def test_serve_latency_bench_with_mesh():
    """serve.py --mesh: pod serving through the support-sharded bank (on
    the virtual 8-device backend) — the serving fn composes featurize +
    the shard_mapped full-mode predict."""
    import serve

    out = serve.main([
        "--dataset", "synthetic", "--arch", "resnet10",
        "--batch_size", "8", "--n_shot_full", "5",
        "--mesh", "2,4",
        "--latency_bench", "--bench_batches", "2",
    ])
    assert out["latency"]["queries_per_sec"] > 0


def test_serve_queries_with_mesh_ragged_chunk(tmp_path):
    """--queries under --mesh: the final chunk is usually ragged
    (len(paths) % batch_size) and the shard_map over 'data' requires the
    full compiled batch — chunks must be padded (and pad rows dropped)."""
    from PIL import Image

    import serve

    rng = np.random.default_rng(3)
    for i in range(3):  # 3 files, batch 8 -> one ragged chunk of 3
        arr = rng.integers(0, 255, size=(48, 48, 3)).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f"q{i}.jpg", quality=90)

    out = serve.main([
        "--dataset", "synthetic", "--arch", "resnet10",
        "--batch_size", "8", "--n_shot_full", "5", "--topk", "2",
        "--mesh", "2,4",
        "--queries", str(tmp_path / "*.jpg"),
    ])
    qs = out["queries"]
    assert len(qs) == 3
    for q in qs:
        assert 0.0 <= q["topk"][0]["prob"] <= 1.0


def test_serve_bank_cache_with_mesh(tmp_path):
    """--bank_cache + --mesh: the warm restore must rebuild the SHARDED
    serving bank (restore_bank -> _build_serving_banks honors the mesh)
    and still serve."""
    import serve

    base = [
        "--dataset", "synthetic", "--arch", "resnet10",
        "--batch_size", "8", "--n_shot_full", "5",
        "--mesh", "2,4",
        "--bank_cache", str(tmp_path / "bank"),
        "--latency_bench", "--bench_batches", "1",
    ]
    cold = serve.main(base)
    warm = serve.main(base)
    assert cold["latency"]["queries_per_sec"] > 0
    assert warm["latency"]["queries_per_sec"] > 0


def test_serve_requires_an_action():
    import serve

    with pytest.raises(SystemExit, match="latency_bench"):
        serve.main(["--dataset", "synthetic", "--arch", "resnet10"])


def test_serve_jpeg_bench_synthetic():
    """Images-in -> answers-out bench: decode stage + device stage +
    pipelined rate all reported, from synthesized JPEG bytes."""
    import serve

    out = serve.main([
        "--dataset", "synthetic", "--arch", "resnet10",
        "--batch_size", "4", "--n_shot_full", "5",
        "--jpeg_bench", "--bench_batches", "2", "--workers", "2",
    ])
    rep = out["jpeg"]
    assert rep["e2e_qps_from_jpeg"] > 0
    assert rep["decode_img_per_sec"] > 0
    assert rep["device_wall_qps"] > 0
    assert rep["bound_by"] in ("host_decode", "device")


def test_serve_bank_cache_roundtrip(tmp_path):
    """Cold start saves the featurized bank; warm start restores it (no
    featurizer pass) and must serve identical latency-path results; a
    config change refuses the stale cache."""
    import serve

    cache = str(tmp_path / "bank")
    base = [
        "--dataset", "synthetic", "--arch", "resnet10",
        "--batch_size", "8", "--n_shot_full", "5",
        "--bank_cache", cache,
        "--latency_bench", "--bench_batches", "2",
    ]
    out_cold = serve.main(base)
    assert os.path.exists(os.path.join(cache, "embeddings.npy"))
    assert os.path.exists(os.path.join(cache, "tag.json"))
    out_warm = serve.main(base)
    assert out_warm["latency"]["batches"] == out_cold["latency"]["batches"]

    with pytest.raises(SystemExit, match="bank_cache"):
        serve.main(base + ["--n_shot_full", "4"])


def test_restore_bank_matches_precompute():
    """NWNet.restore_bank(feats, labels) must reproduce the full
    post-precompute state: identical full-mode output AND the prepared
    serving bank (eval.py's old restore path skipped the prepared bank)."""
    import jax
    import jax.numpy as jnp

    from nwhead_tpu.data import make_synthetic_dataset
    from nwhead_tpu.models import load_model
    from nwhead_tpu.nw.net import NWNet

    ds = make_synthetic_dataset(n=24, n_classes=4, size=16, seed=0)

    def fresh():
        return NWNet(
            load_model("resnet10"), n_classes=4, support_dataset=ds,
            feat_dim=512, n_shot=1, n_shot_full=10, seed=0,
            fused_min_support=1,
        )

    net1 = fresh()
    x = jnp.asarray(ds.gather(np.arange(6)))
    variables = net1.init(jax.random.PRNGKey(0), x)
    net1.precompute(variables)
    want = np.asarray(net1.predict(variables, x, "full"))

    net2 = fresh()
    net2.restore_bank(
        variables, np.asarray(net1.full_feat), np.asarray(net1.full_y),
        net1.support_eval.full_meta,
    )
    assert net2._prepared_full is not None
    got = np.asarray(net2.predict(variables, x, "full"))
    np.testing.assert_array_equal(want, got)
    # The non-full modes were rebuilt too.
    for mode in ("random", "cluster", "knn", "hnsw"):
        assert np.isfinite(np.asarray(net2.predict(variables, x, mode))).all()


def test_eval_cli_bank_cache_roundtrip(tmp_path):
    """eval.py --bank_cache: cold run saves, warm run restores through
    NWNet.restore_bank (prepared serving bank included) with matching
    full-mode metrics."""
    import eval as eval_cli

    cache = str(tmp_path / "bank")
    argv = [
        "--dataset", "synthetic", "--arch", "resnet10",
        "--modes", "full", "--batch_size", "8", "--num_val_steps", "2",
        "--n_shot_full", "5", "--bank_cache", cache,
    ]
    cold = eval_cli.main(argv)
    assert os.path.exists(os.path.join(cache, "embeddings.npy"))
    warm = eval_cli.main(argv)
    assert warm["full"]["acc"] == cold["full"]["acc"]
    assert abs(warm["full"]["nll"] - cold["full"]["nll"]) < 1e-6


def test_serve_bank_cache_refuses_feature_space_changes(tmp_path):
    """Any flag that changes the featurizer's weights or numerics (--bf16
    here) must invalidate the cache tag."""
    import serve

    cache = str(tmp_path / "bank")
    base = [
        "--dataset", "synthetic", "--arch", "resnet10",
        "--batch_size", "8", "--n_shot_full", "5",
        "--bank_cache", cache,
        "--latency_bench", "--bench_batches", "1",
    ]
    serve.main(base)
    with pytest.raises(SystemExit, match="bank_cache"):
        serve.main(base + ["--bf16"])
    with pytest.raises(SystemExit, match="bank_cache"):
        serve.main(base + ["--seed", "1"])


def test_serve_mode_ivf_latency_bench():
    """--serve_mode ivf: the one-dispatch serving fn routes through the
    IVF-pruned head. A probe count covering every tile must agree with
    full-mode serving on the same stack."""
    import serve

    common = [
        "--dataset", "synthetic", "--arch", "resnet10",
        "--batch_size", "8", "--n_shot_full", "5",
        "--latency_bench", "--bench_batches", "2",
    ]
    out_ivf = serve.main(common + ["--serve_mode", "ivf",
                                   "--ivf_probe", "4096"])
    assert out_ivf["latency"]["queries_per_sec"] > 0


def test_make_serving_fn_ivf_matches_full():
    """make_serving_fn(mode='ivf') at full probe == the full-mode serving
    fn; pruned probe stays a valid distribution; bank edits reach the
    live closure."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from nwhead_tpu.data.datasets import ArrayDataset
    from nwhead_tpu.nw.net import NWNet

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Dense(32)(x.reshape(x.shape[0], -1))

    rng = np.random.default_rng(11)
    xs = rng.standard_normal((300, 4, 4, 3)).astype(np.float32)
    ys = rng.integers(0, 10, 300).astype(np.int32)
    net = NWNet(
        Tiny(), n_classes=10, support_dataset=ArrayDataset(xs, ys),
        feat_dim=32, n_shot_full=30, fused_min_support=1,
        ivf_n_probe=10_000,  # covers every tile -> exact full mode
    )
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(xs[:2]))
    net.precompute(variables)
    full = net.make_serving_fn(variables)
    ivf = net.make_serving_fn(variables, mode="ivf")
    q = jnp.asarray(xs[:8])
    pd = np.abs(
        np.exp(np.asarray(ivf(q))) - np.exp(np.asarray(full(q)))
    ).max()
    assert pd < 1e-6, pd

    # Live bank read: an edit invalidates the cache; the SAME closure
    # serves the grown bank on its next call.
    net.add_support(variables, xs[:4], ys[:4])
    out2 = np.asarray(ivf(q))
    assert np.isfinite(out2).all()
    probs = np.exp(out2).sum(-1)
    np.testing.assert_allclose(probs, 1.0, rtol=1e-4)

    with pytest.raises(ValueError, match="full.*ivf|ivf.*full"):
        net.make_serving_fn(variables, mode="bogus")
