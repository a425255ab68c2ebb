"""End-to-end exercise of scripts/parity_run.py (the packaged BASELINE.md
parity protocol): both stacks train on the same fixture data with the same
recipe, metrics and deltas are produced, and the JSON report is written.
The moment real CUB-200 is on disk, the identical command path produces the
BASELINE.md numbers."""

import json
import os
import sys

import numpy as np
import pytest


def test_parity_runner_fixture_scale(tmp_path):
    pytest.importorskip("torch")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    try:
        import parity_run
    finally:
        sys.path.pop(0)

    out = tmp_path / "parity.json"
    report = parity_run.main([
        "--dataset", "synthetic",
        "--arch", "resnet10", "--ref_arch", "resnet10",
        "--feat_dim", "512",
        "--epochs", "2", "--steps_per_epoch", "3",
        "--batch_size", "3", "--n_way", "3", "--n_shot", "2",
        "--lr", "0.01", "--milestones", "100",
        "--modes", "random", "full",
        "--int8_eval", "--calib_images", "32", "--bf16_eval",
        "--int4_eval",
        "--out", str(out),
    ])

    assert set(report) >= {"reference", "tpu", "delta", "protocol"}
    for stack in ("reference", "tpu"):
        for mode in ("random", "full"):
            m = report[stack][mode]
            assert np.isfinite([m["acc"], m["nll"], m["ece"]]).all(), (stack, mode, m)
            assert 0.0 <= m["acc"] <= 100.0
    # Deltas computed for every mode/metric.
    assert set(report["delta"]) == {"random", "full"}
    saved = json.loads(out.read_text())
    assert saved["tpu"]["full"]["acc"] == report["tpu"]["full"]["acc"]
    # int8-PTQ serving accuracy on the trained weights: close to float full
    # mode on the fixture task.
    m8 = report["tpu"]["full_int8"]
    assert np.isfinite([m8["acc"], m8["nll"], m8["ece"]]).all()
    assert abs(m8["acc"] - report["tpu"]["full"]["acc"]) <= 10.0, (
        m8, report["tpu"]["full"]
    )
    # bf16/int4 serving-bank accuracy on the trained weights, same bound.
    for key in ("full_bf16", "full_int4"):
        mb = report["tpu"][key]
        assert np.isfinite([mb["acc"], mb["nll"], mb["ece"]]).all()
        assert abs(mb["acc"] - report["tpu"]["full"]["acc"]) <= 10.0, key


def test_parity_runner_fc_baseline(tmp_path):
    """--fc_baseline trains the FC-head baseline on both stacks with the
    same recipe and includes it in metrics + deltas — the papers' NW-vs-FC
    comparison, runnable on any dataset the CLI knows."""
    pytest.importorskip("torch")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    try:
        import parity_run
    finally:
        sys.path.pop(0)

    report = parity_run.main([
        "--dataset", "synthetic",
        "--arch", "resnet10", "--ref_arch", "resnet10",
        "--feat_dim", "512",
        "--epochs", "2", "--steps_per_epoch", "3",
        "--batch_size", "3", "--n_way", "3",
        "--lr", "0.01", "--milestones", "100",
        "--modes", "full", "--fc_baseline",
        "--out", str(tmp_path / "parity_fc.json"),
    ])
    for stack in ("reference", "tpu"):
        m = report[stack]["fc"]
        assert np.isfinite([m["acc"], m["nll"], m["ece"]]).all(), (stack, m)
        assert 0.0 <= m["acc"] <= 100.0
    assert set(report["delta"]) == {"full", "fc"}
