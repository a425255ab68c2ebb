"""CLI-surface coverage: flower/aircraft dataset wiring, --workers plumbing,
--pretrained_path import, and --mesh distributed training — the reference's
full flag surface (``/root/reference/train.py:22-113,177-186,212-214``)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _write_jpg(path, arr):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8)).save(path, quality=90)


@pytest.fixture()
def flowers_root(tmp_path):
    """Flowers-102-format fixture: jpg/image_XXXXX.jpg + .mat manifests."""
    from scipy.io import savemat

    root = tmp_path / "flowers"
    rng = np.random.default_rng(0)
    n = 12
    labels = np.tile(np.arange(1, 4), n // 3)  # 1-based like the real set
    for i in range(1, n + 1):
        img = rng.integers(0, 255, size=(40, 40, 3))
        _write_jpg(str(root / "jpg" / f"image_{i:05d}.jpg"), img)
    savemat(root / "imagelabels.mat", {"labels": labels[None, :]})
    ids = np.arange(1, n + 1)
    savemat(
        root / "setid.mat",
        {"trnid": ids[:6][None], "valid": ids[6:9][None], "tstid": ids[9:][None]},
    )
    return root


@pytest.fixture()
def aircraft_root(tmp_path):
    """FGVC-Aircraft-format fixture: data/images + variant manifests."""
    root = tmp_path / "aircraft"
    data = root / "data"
    rng = np.random.default_rng(1)
    variants = ["707-320", "A310", "F-16"]
    (data / "images").mkdir(parents=True)
    (data / "variants.txt").write_text("\n".join(variants))
    tv_lines, test_lines = [], []
    for i in range(12):
        img_id = f"{1000 + i}"
        _write_jpg(str(data / "images" / f"{img_id}.jpg"),
                   rng.integers(0, 255, size=(40, 40, 3)))
        line = f"{img_id} {variants[i % 3]}"
        (tv_lines if i < 8 else test_lines).append(line)
    (data / "images_variant_trainval.txt").write_text("\n".join(tv_lines))
    (data / "images_variant_test.txt").write_text("\n".join(test_lines))
    return root


def test_flower_cli_wiring(flowers_root):
    """--dataset flower builds the reference's split mapping
    (train='train', val='test'; train.py:177-181) with workers plumbed."""
    import argparse

    import train as T

    args = argparse.Namespace(
        dataset="flower", data_dir=str(flowers_root), seed=0, workers=3
    )
    train_ds, val_ds = T.build_datasets(args)
    # num_classes is the dataset constant 102 (train.py:180), regardless of
    # how many classes the on-disk fixture exercises.
    assert train_ds.num_classes == 102 and len(train_ds) == 6
    assert len(val_ds) == 3
    assert train_ds.workers == 3  # --workers reaches the dataset
    imgs = train_ds.gather(np.arange(2))
    assert imgs.shape == (2, 224, 224, 3)  # imagenet train transform applied
    assert set(np.asarray(train_ds.targets)) <= {0, 1, 2}  # 0-based


def test_aircraft_cli_wiring(aircraft_root):
    """--dataset aircraft: trainval/test manifests, variant-name labels
    (train.py:182-186)."""
    import argparse

    import train as T

    args = argparse.Namespace(
        dataset="aircraft", data_dir=str(aircraft_root), seed=0, workers=2
    )
    train_ds, val_ds = T.build_datasets(args)
    assert train_ds.num_classes == 3 and len(train_ds) == 8
    assert len(val_ds) == 4
    assert val_ds.workers == 2
    imgs = val_ds.gather([0])
    assert imgs.shape == (1, 224, 224, 3)  # eval transform applied


def _reference_resnet18_state_dict():
    """torchvision-format resnet18 state dict built from the reference's
    model zoo (torchvision itself is not installed here; the reference uses
    identical parameter names, model/resnet.py)."""
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        from model.resnet import resnet18 as torch_resnet18
    finally:
        sys.path.remove("/root/reference")
    torch_model = torch_resnet18()
    return torch_model.state_dict()


def test_pretrained_path_via_load_model(tmp_path):
    """load_model(name, pretrained=<path>) + NWNet.init imports the torch
    weights (the reference's pretrained workflow, model/resnet.py:259-267)."""
    import torch

    from nwhead_tpu.data import make_synthetic_dataset
    from nwhead_tpu.models import load_model
    from nwhead_tpu.nw.net import NWNet

    sd = _reference_resnet18_state_dict()
    ckpt = tmp_path / "resnet18.pth"
    torch.save(sd, str(ckpt))

    ds = make_synthetic_dataset(n=16, n_classes=2, size=32, seed=0)
    featurizer = load_model("resnet18", pretrained=str(ckpt))
    assert featurizer.pretrained_path == str(ckpt)
    net = NWNet(featurizer, 2, support_dataset=ds, feat_dim=512, n_shot=1, seed=0)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(ds.gather([0, 1])))

    got = np.asarray(variables["params"]["featurizer"]["conv1"]["kernel"])
    want = sd["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # BN running stats imported too.
    got_var = np.asarray(variables["batch_stats"]["featurizer"]["bn1"]["var"])
    np.testing.assert_allclose(got_var, sd["bn1.running_var"].numpy(), rtol=1e-6)


def test_cli_trains_from_pretrained(tmp_path):
    """train.py --pretrained_path: full CLI run starting from imported
    weights (the reference's finetune-pretrained flagship workflow)."""
    import torch

    import train as T

    ckpt = tmp_path / "resnet18.pth"
    torch.save(_reference_resnet18_state_dict(), str(ckpt))

    T.main([
        "--dataset", "synthetic", "--models_dir", str(tmp_path / "runs"),
        "--arch", "resnet18", "--pretrained_path", str(ckpt),
        "--batch_size", "2", "--n_way", "2", "--n_shot", "1",
        "--num_epochs", "1", "--num_steps_per_epoch", "2",
        "--num_val_steps_per_epoch", "1", "--log_interval", "1",
    ])
    run_dir = next(p for p in (tmp_path / "runs").iterdir() if p.is_dir())
    assert (run_dir / "checkpoints" / "model.0001").exists()


def test_cli_mesh_distributed_training(tmp_path):
    """train.py --mesh 2,2: data-parallel episodic training + support-sharded
    full-mode eval through the CLI on the virtual 8-device backend."""
    import train as T

    T.main([
        "--dataset", "synthetic", "--models_dir", str(tmp_path / "runs"),
        "--mesh", "2,2",
        "--batch_size", "4", "--n_way", "4", "--n_shot", "1",
        "--num_epochs", "1", "--num_steps_per_epoch", "2",
        "--num_val_steps_per_epoch", "1", "--log_interval", "1",
    ])
    run_dir = next(p for p in (tmp_path / "runs").iterdir() if p.is_dir())
    assert (run_dir / "checkpoints" / "model.0001").exists()


def test_cli_mesh_eval_sharded_modes(tmp_path):
    """train.py --mesh -> eval.py --mesh over the checkpoint, evaluating
    the three sharded inference paths (full / knn / ensemble). With a
    single environment the sharded ensemble must equal full mode exactly
    (E=1 prob-space mean is the identity)."""
    import eval as E
    import train as T

    T.main([
        "--dataset", "synthetic", "--models_dir", str(tmp_path / "runs"),
        "--mesh", "2,2",
        "--batch_size", "4", "--n_way", "4", "--n_shot", "1",
        "--num_epochs", "1", "--num_steps_per_epoch", "2",
        "--num_val_steps_per_epoch", "1", "--log_interval", "1",
    ])
    run_dir = next(p for p in (tmp_path / "runs").iterdir() if p.is_dir())
    out = E.main([
        "--dataset", "synthetic", "--mesh", "2,2",
        "--modes", "full", "knn", "ensemble",
        "--batch_size", "4", "--num_val_steps", "2",
        "--ckpt", str(run_dir / "checkpoints" / "model.0001"),
    ])
    for mode in ("full", "knn", "ensemble"):
        assert np.isfinite(out[mode]["acc"]) and 0 <= out[mode]["acc"] <= 100
    assert abs(out["ensemble"]["nll"] - out["full"]["nll"]) < 1e-5


def test_cli_mesh_rejects_fchead(tmp_path):
    import train as T

    with pytest.raises(NotImplementedError):
        T.main([
            "--dataset", "synthetic", "--models_dir", str(tmp_path / "runs"),
            "--mesh", "2,2", "--train_method", "fchead",
            "--batch_size", "4", "--num_epochs", "1",
        ])
