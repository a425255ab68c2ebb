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
    assert rep["device_qps_tensor_fed"] > 0
    assert rep["bound_by"] in ("host_decode", "device")
