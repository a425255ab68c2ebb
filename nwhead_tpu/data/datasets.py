"""Datasets: manifest-parsing image datasets + in-memory arrays.

Dataset protocol (what NWNet/Trainer require):
  * ``.targets``     — int label per item (the reference hard-requires this,
                       ``nw.py:72``);
  * ``.num_classes`` — class count;
  * ``gather(indices) -> (n, H, W, C) float32`` — batched fetch+transform;
  * ``__len__``.

Parsers reproduce the reference's split semantics:
  * CUB-200-2011 (``data/bird.py``): parses ``train_test_split.txt`` /
    ``images.txt`` / ``image_class_labels.txt``; **split==0 is train,
    split==1 is test** (``bird.py:22-25``); labels shifted to 0-base
    (``bird.py:36``); images decoded as RGB.
  * Stanford Dogs (``data/dog.py``): ``train_list.csv`` / ``test_list.csv``
    with (path, label) rows, labels to 0-base (``dog.py:17-24``).

Plain-text parsing (no pandas) and PIL decode; decode happens at gather time
on the host, overlapped with device compute by the prefetching loader.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import numpy as np


class ArrayDataset:
    """In-memory dataset over (N, H, W, C) arrays — CIFAR-style data and the
    synthetic test sets."""

    def __init__(
        self,
        images: np.ndarray,
        targets: Sequence[int],
        num_classes: Optional[int] = None,
        transform: Optional[Callable] = None,
    ) -> None:
        assert len(images) == len(targets)
        self.images = images
        self.targets = np.asarray(targets)
        self.num_classes = (
            num_classes if num_classes is not None else int(self.targets.max()) + 1
        )
        self.transform = transform

    def __len__(self) -> int:
        return len(self.images)

    def gather(self, indices) -> np.ndarray:
        indices = np.asarray(indices)
        if self.transform is None:
            return self.images[indices].astype(np.float32)
        return np.stack([self.transform(self.images[i]) for i in indices])


class ImageFileDataset:
    """Dataset over image files on disk.

    Decode runs across a worker pool at gather time — the host-side
    equivalent of the reference's DataLoader workers (``train.py:190-196``),
    composed with the prefetching pipeline so decode overlaps device compute.

    ``decoder``:
      * ``"native"`` (default) — the first-party C++ libjpeg pool
        (``native/decode.cpp``): persistent per-thread decompressors, no
        PIL object churn, no GIL on the decode path. Non-JPEG files (and
        environments where the native build is unavailable) fall back to
        PIL transparently.
      * ``"pil"`` — PIL decode on a Python thread pool.
    """

    def __init__(
        self,
        paths: Sequence[str],
        targets: Sequence[int],
        num_classes: int,
        transform: Optional[Callable] = None,
        workers: int = 8,
        decoder: str = "native",
    ) -> None:
        assert len(paths) == len(targets)
        self.paths = list(paths)
        self.targets = np.asarray(targets)
        self.num_classes = num_classes
        self.transform = transform
        self.workers = workers
        self.decoder = decoder
        self._pool = None
        self._native_pool = None
        self._native_failed = False

    def __len__(self) -> int:
        return len(self.paths)

    def _native(self):
        if self._native_pool is None and not self._native_failed:
            try:
                from nwhead_tpu.native.decode import JpegDecodePool

                self._native_pool = JpegDecodePool(max(1, self.workers))
            except Exception:
                self._native_failed = True
        return self._native_pool

    def _load(self, idx: int) -> np.ndarray:
        from PIL import Image

        img = np.asarray(Image.open(self.paths[idx]).convert("RGB"))
        return self.transform(img) if self.transform is not None else to_float(img)

    def _apply_transform(self, img: np.ndarray) -> np.ndarray:
        return self.transform(img) if self.transform is not None else to_float(img)

    def gather(self, indices) -> np.ndarray:
        indices = np.asarray(indices)
        idx_list = [int(i) for i in indices]

        if self.decoder == "native_fused" and len(idx_list) > 0:
            out = self._gather_fused(idx_list)
            if out is not None:
                return out

        if self.decoder in ("native", "native_fused") and len(idx_list) > 0:
            is_jpeg = [
                self.paths[i].lower().endswith((".jpg", ".jpeg"))
                for i in idx_list
            ]
            pool = self._native() if all(is_jpeg) else None
            if pool is not None:
                try:
                    raw = pool.decode_batch([self.paths[i] for i in idx_list])
                    return np.stack([self._apply_transform(r) for r in raw])
                except Exception:
                    pass  # corrupt/odd files: fall through to PIL below

        if self.workers > 1 and len(idx_list) > 1:
            if self._pool is None:
                from concurrent.futures import ThreadPoolExecutor

                self._pool = ThreadPoolExecutor(max_workers=self.workers)
            return np.stack(list(self._pool.map(self._load, idx_list)))
        return np.stack([self._load(i) for i in idx_list])

    def _gather_fused(self, idx_list) -> Optional[np.ndarray]:
        """decoder='native_fused': decode+crop+resize in ONE native pass
        (IDCT-level downscale included) when the transform is expressible as
        crop+resize (imagenet train/eval kinds); returns None to fall back.
        Note: uses corner-aligned bilinear (vs PIL's antialiased filter) —
        subpixel differences from the PIL path, same augmentation semantics.
        """
        t = self.transform
        if t is None or not getattr(t, "supports_fused_decode", False):
            return None
        paths = [self.paths[i] for i in idx_list]
        if not all(p.lower().endswith((".jpg", ".jpeg")) for p in paths):
            return None
        pool = self._native()
        if pool is None:
            return None
        try:
            from nwhead_tpu.native.decode import jpeg_dims

            boxes, flips = [], []
            for p in paths:
                h, w = jpeg_dims(p)
                box, flip = t.crop_geometry(h, w)
                boxes.append(box)
                flips.append(flip)
            # Flips ride the native resize write (mirrored column stores) —
            # no python-side per-image reversal copies afterwards.
            batch = pool.decode_crop_resize(
                paths, np.asarray(boxes, np.int32), (t.size, t.size),
                flips=flips,
            )
            return t.finish_batch(batch, None)
        except Exception:
            return None


def to_float(img: np.ndarray) -> np.ndarray:
    if img.dtype == np.uint8:
        return img.astype(np.float32) / 255.0
    return img.astype(np.float32)


def _read_two_column(path: str):
    """Parse whitespace-separated 'id value' lines."""
    ids, vals = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            a, b = line.split(None, 1)
            ids.append(int(a))
            vals.append(b.strip())
    return ids, vals


class Cub200Dataset(ImageFileDataset):
    """CUB-200-2011 (``data/bird.py:7-50`` semantics)."""

    def __init__(self, root_path: str, is_train: bool, transform=None, workers: int = 8, decoder: str = "native") -> None:
        split_ids, split_vals = _read_two_column(
            os.path.join(root_path, "train_test_split.txt")
        )
        img_ids, img_paths = _read_two_column(os.path.join(root_path, "images.txt"))
        lbl_ids, lbl_vals = _read_two_column(
            os.path.join(root_path, "image_class_labels.txt")
        )
        want = 0 if is_train else 1  # split==0 -> train (bird.py:22-25)
        keep = {i for i, s in zip(split_ids, split_vals) if int(s) == want}

        paths = [
            os.path.join(root_path, "images", p)
            for i, p in zip(img_ids, img_paths)
            if i in keep
        ]
        targets = [int(v) - 1 for i, v in zip(lbl_ids, lbl_vals) if i in keep]
        super().__init__(paths, targets, num_classes=200, transform=transform, workers=workers, decoder=decoder)


class StanfordDogDataset(ImageFileDataset):
    """Stanford Dogs (``data/dog.py:7-38`` semantics)."""

    def __init__(self, root_path: str, is_train: bool, transform=None, workers: int = 8, decoder: str = "native") -> None:
        name = "train_list.csv" if is_train else "test_list.csv"
        paths, targets = [], []
        with open(os.path.join(root_path, name)) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                p, lbl = line.rsplit(",", 1)
                paths.append(os.path.join(root_path, "Images", p))
                targets.append(int(lbl) - 1)
        super().__init__(paths, targets, num_classes=120, transform=transform, workers=workers, decoder=decoder)


class Flowers102Dataset(ImageFileDataset):
    """Oxford Flowers-102 (the reference wires it via torchvision,
    ``train.py:177-181``; labels 0-based like ``_labels``).

    Expects the standard layout: ``jpg/image_XXXXX.jpg``,
    ``imagelabels.mat``, ``setid.mat`` under ``root_path``.
    """

    def __init__(self, root_path: str, split: str = "train", transform=None, workers: int = 8, decoder: str = "native") -> None:
        from scipy.io import loadmat

        labels = loadmat(os.path.join(root_path, "imagelabels.mat"))["labels"][0]
        setid = loadmat(os.path.join(root_path, "setid.mat"))
        ids = {
            "train": setid["trnid"][0],
            "val": setid["valid"][0],
            "test": setid["tstid"][0],
        }[split]
        paths = [
            os.path.join(root_path, "jpg", f"image_{i:05d}.jpg") for i in ids
        ]
        targets = [int(labels[i - 1]) - 1 for i in ids]
        super().__init__(paths, targets, num_classes=102, transform=transform, workers=workers, decoder=decoder)


class FGVCAircraftDataset(ImageFileDataset):
    """FGVC-Aircraft variant-level classification (``train.py:182-186``).

    Expects ``data/images/*.jpg`` and ``data/images_variant_{split}.txt``
    manifests under ``root_path`` (splits: train, val, trainval, test).
    """

    def __init__(self, root_path: str, split: str = "trainval", transform=None, workers: int = 8, decoder: str = "native") -> None:
        data_dir = os.path.join(root_path, "data")
        manifest = os.path.join(data_dir, f"images_variant_{split}.txt")
        variants_file = os.path.join(data_dir, "variants.txt")
        with open(variants_file) as f:
            variants = [l.strip() for l in f if l.strip()]
        v2id = {v: i for i, v in enumerate(variants)}
        paths, targets = [], []
        with open(manifest) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                img_id, variant = line.split(" ", 1)
                paths.append(os.path.join(data_dir, "images", f"{img_id}.jpg"))
                targets.append(v2id[variant])
        super().__init__(paths, targets, num_classes=len(variants), transform=transform, workers=workers, decoder=decoder)


def make_digits_dataset(
    train: bool = True,
    size: int = 32,
    transform: Optional[Callable] = None,
) -> ArrayDataset:
    """REAL image data available without network egress: scikit-learn's
    bundled handwritten-digits set (1797 8x8 grayscale images, 10
    classes — UCI Optical Recognition of Handwritten Digits). This gives
    the accuracy-parity protocol (``scripts/parity_run.py``) a real-data
    point in environments where CUB-200/Dogs cannot be downloaded.

    Deterministic stratified split (per class, every 5th item is
    validation — no RNG, both stacks see identical data); images scale
    to [0, 1], upsample 8x8 -> size x size (nearest-neighbor
    ``np.kron``), and replicate to 3 channels for the RGB backbones.
    """
    from sklearn.datasets import load_digits

    assert size % 8 == 0, f"size must be a multiple of 8, got {size}"
    d = load_digits()
    imgs = (d.images / 16.0).astype(np.float32)
    y = d.target.astype(np.int64)
    idx_parts = []
    for c in range(10):
        ci = np.where(y == c)[0]
        val = np.arange(len(ci)) % 5 == 0
        idx_parts.append(ci[~val] if train else ci[val])
    idx = np.sort(np.concatenate(idx_parts))
    k = size // 8
    x = np.kron(imgs[idx], np.ones((1, k, k), np.float32))
    x = np.repeat(x[..., None], 3, axis=-1)
    return ArrayDataset(x, y[idx], num_classes=10, transform=transform)


def make_synthetic_dataset(
    n: int = 64,
    n_classes: int = 4,
    size: int = 8,
    channels: int = 3,
    seed: int = 0,
    transform=None,
    class_patterns: float = 0.0,
    pattern_seed: int = 1234,
) -> ArrayDataset:
    """Tiny class-separable synthetic dataset for tests: images whose mean
    intensity encodes the class, plus noise.

    ``class_patterns > 0`` additionally mixes in a fixed random spatial
    pattern per class (drawn from ``pattern_seed``, which train/val splits
    must SHARE) — the mean-intensity code alone stops separating classes
    once 1/n_classes falls under the noise floor (e.g. C=200), and the
    endurance recipe needs a learnable task at CUB scale."""
    rng = np.random.default_rng(seed)
    targets = np.tile(np.arange(n_classes), n // n_classes + 1)[:n]
    images = rng.normal(0, 0.1, size=(n, size, size, channels)).astype(np.float32)
    images += (targets / n_classes)[:, None, None, None].astype(np.float32)
    if class_patterns > 0:
        prng = np.random.default_rng(pattern_seed)
        pat = prng.normal(
            0, class_patterns, size=(n_classes, size, size, channels)
        ).astype(np.float32)
        images += pat[targets]
    return ArrayDataset(images, targets, num_classes=n_classes, transform=transform)
