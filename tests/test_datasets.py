"""Dataset parser tests over synthetic on-disk trees (manifest semantics:
CUB split==0 is train, 0-based labels, RGB decode; Dogs csv; Flowers .mat;
Aircraft variant manifests)."""

import os

import numpy as np
import pytest


def _write_img(path, color, size=24):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = np.full((size, size, 3), color, dtype=np.uint8)
    Image.fromarray(arr).save(path)


@pytest.fixture
def cub_tree(tmp_path):
    root = tmp_path / "cub"
    root.mkdir()
    # 6 images; ids 1-3 class 1, ids 4-6 class 2; odd ids train (split 0).
    lines_split, lines_img, lines_lbl = [], [], []
    for i in range(1, 7):
        label = 1 if i <= 3 else 2
        name = f"{label:03d}.Class/{i}.jpg"
        _write_img(str(root / "images" / name), color=i * 30)
        lines_img.append(f"{i} {name}")
        lines_lbl.append(f"{i} {label}")
        lines_split.append(f"{i} {0 if i % 2 == 1 else 1}")
    (root / "images.txt").write_text("\n".join(lines_img))
    (root / "image_class_labels.txt").write_text("\n".join(lines_lbl))
    (root / "train_test_split.txt").write_text("\n".join(lines_split))
    return str(root)


def test_cub_parser(cub_tree):
    from nwhead_tpu.data import Cub200Dataset

    train = Cub200Dataset(cub_tree, True)
    test = Cub200Dataset(cub_tree, False)
    assert len(train) == 3 and len(test) == 3  # split==0 -> train
    assert train.num_classes == 200
    np.testing.assert_array_equal(train.targets, [0, 0, 1])  # 0-based
    imgs = train.gather([0, 1])
    assert imgs.shape == (2, 24, 24, 3)
    assert imgs.dtype == np.float32
    # image 1 (color 30) is the first train image
    assert abs(imgs[0].mean() - 30 / 255) < 1e-3


def test_dog_parser(tmp_path):
    from nwhead_tpu.data import StanfordDogDataset

    root = tmp_path / "dogs"
    root.mkdir()
    rows = []
    for i, (name, lbl) in enumerate([("a/1.jpg", 1), ("b/2.jpg", 2), ("a/3.jpg", 1)]):
        _write_img(str(root / "Images" / name), color=50 + i * 20)
        rows.append(f"{name},{lbl}")
    (root / "train_list.csv").write_text("\n".join(rows))
    (root / "test_list.csv").write_text(rows[0])

    train = StanfordDogDataset(str(root), True)
    assert len(train) == 3
    np.testing.assert_array_equal(train.targets, [0, 1, 0])
    assert train.gather([1]).shape == (1, 24, 24, 3)


def test_flowers_parser(tmp_path):
    from scipy.io import savemat

    from nwhead_tpu.data import Flowers102Dataset

    root = tmp_path / "flowers"
    (root / "jpg").mkdir(parents=True)
    labels = np.array([[1, 2, 1, 2]])  # 1-based, images 1..4
    for i in range(1, 5):
        _write_img(str(root / "jpg" / f"image_{i:05d}.jpg"), color=i * 40)
    savemat(str(root / "imagelabels.mat"), {"labels": labels})
    savemat(
        str(root / "setid.mat"),
        {"trnid": np.array([[1, 2]]), "valid": np.array([[3]]), "tstid": np.array([[4]])},
    )
    train = Flowers102Dataset(str(root), "train")
    assert len(train) == 2
    np.testing.assert_array_equal(train.targets, [0, 1])
    test = Flowers102Dataset(str(root), "test")
    assert len(test) == 1 and test.targets[0] == 1


def test_aircraft_parser(tmp_path):
    from nwhead_tpu.data import FGVCAircraftDataset

    root = tmp_path / "aircraft"
    (root / "data" / "images").mkdir(parents=True)
    (root / "data" / "variants.txt").write_text("707-320\nA300B4\n")
    rows = ["0001 707-320", "0002 A300B4", "0003 707-320"]
    (root / "data" / "images_variant_trainval.txt").write_text("\n".join(rows))
    for i in range(1, 4):
        _write_img(str(root / "data" / "images" / f"{i:04d}.jpg"), color=i * 30)
    ds = FGVCAircraftDataset(str(root), "trainval")
    assert len(ds) == 3 and ds.num_classes == 2
    np.testing.assert_array_equal(ds.targets, [0, 1, 0])


def test_parallel_gather_deterministic_images(cub_tree):
    """Thread-pool gather returns images in index order."""
    from nwhead_tpu.data import Cub200Dataset

    ds = Cub200Dataset(cub_tree, True)
    a = ds.gather([0, 1, 2])
    b = ds.gather([0, 1, 2])
    np.testing.assert_array_equal(a, b)
    # order respected: gather([2,0]) == reversed slices
    c = ds.gather([2, 0])
    np.testing.assert_array_equal(c[0], a[2])
    np.testing.assert_array_equal(c[1], a[0])


def test_transforms_shapes(rng):
    from nwhead_tpu.data import transforms as T

    img = (rng.random((60, 80, 3)) * 255).astype(np.uint8)
    out = T.imagenet_train_transform(size=32, seed=0)(img)
    assert out.shape == (32, 32, 3) and out.dtype == np.float32
    out = T.imagenet_eval_transform(size=32)(img)
    assert out.shape == (32, 32, 3)
    cif = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    out = T.cifar_train_transform(seed=0)(cif)
    assert out.shape == (32, 32, 3)
    out = T.cifar_eval_transform()(cif)
    assert out.shape == (32, 32, 3)


def test_device_normalize_transform_matches_host():
    """device_normalize=True: the transform returns uint8 and the on-device
    normalize reproduces the host-normalized f32 pipeline exactly (same
    geometric ops, same constants)."""
    import jax.numpy as jnp

    from nwhead_tpu.data import transforms as T

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(300, 400, 3)).astype(np.uint8)

    host_t = T.imagenet_eval_transform(size=64)
    dev_t = T.imagenet_eval_transform(size=64, device_normalize=True)
    u8 = dev_t(img)
    assert u8.dtype == np.uint8
    want = host_t(img)
    got = np.asarray(T.device_normalize_fn()(jnp.asarray(u8)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # finish_batch honors the flag too (fused-decode path).
    batch = np.stack([u8, u8])
    out = dev_t.finish_batch(batch.copy(), [False, True])
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out[1], u8[:, ::-1])


def test_digits_dataset_real_data():
    """sklearn's bundled handwritten digits as a no-egress REAL dataset:
    deterministic stratified split, [0,1] 3-channel upsampled images,
    disjoint train/val."""
    from nwhead_tpu.data import make_digits_dataset

    tr = make_digits_dataset(True)
    va = make_digits_dataset(False)
    assert len(tr) == 1433 and len(va) == 364
    assert tr.images.shape[1:] == (32, 32, 3)
    assert tr.num_classes == va.num_classes == 10
    assert 0.0 <= tr.images.min() and tr.images.max() <= 1.0
    # Every class present on both sides; split is deterministic.
    assert set(np.unique(tr.targets)) == set(range(10))
    assert set(np.unique(va.targets)) == set(range(10))
    tr2 = make_digits_dataset(True)
    np.testing.assert_array_equal(tr.images[0], tr2.images[0])
    # Channels replicate grayscale.
    np.testing.assert_array_equal(tr.images[..., 0], tr.images[..., 2])


def test_digits_cli_wired(tmp_path):
    """train.py --dataset digits runs an epoch end to end."""
    import train as train_cli

    train_cli.main([
        "--dataset", "digits", "--train_method", "nwhead",
        "--arch", "resnet10", "--num_epochs", "1", "--batch_size", "4",
        "--n_way", "4", "--num_steps_per_epoch", "2",
        "--num_val_steps_per_epoch", "2", "--models_dir", str(tmp_path),
    ])
