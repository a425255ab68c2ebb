"""Image transforms for the input pipeline.

Numpy/PIL host-side equivalents of the reference's torchvision pipelines
(``train.py:136-159``):
  * ImageNet-style train: RandomResizedCrop(224) + RandomHorizontalFlip +
    normalize(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225));
  * ImageNet-style eval: Resize(256) + CenterCrop(224) + normalize;
  * CIFAR train: RandomCrop(32, padding=4) + flip + normalize
    (mean=(0.4914, 0.4822, 0.4465), std=(0.2023, 0.1994, 0.2010));
  * CIFAR eval: normalize only.

Layout is NHWC float32 (TPU-native). Decode + geometric ops run on the host
(they're per-image, data-dependent); normalization is cheap and folded here
too so device steps receive ready tensors. Randomness uses a
``numpy.random.Generator`` owned by the transform (seedable).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
CIFAR_MEAN = (0.4914, 0.4822, 0.4465)
CIFAR_STD = (0.2023, 0.1994, 0.2010)


def to_float(img: np.ndarray) -> np.ndarray:
    """uint8 HWC -> float32 HWC in [0, 1] (ToTensor's scaling, NHWC layout)."""
    if img.dtype == np.uint8:
        return img.astype(np.float32) / 255.0
    return img.astype(np.float32)


def normalize(img: np.ndarray, mean: Sequence[float], std: Sequence[float]) -> np.ndarray:
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    return (img - mean) / std


def _resize_pil(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Bilinear resize via PIL (antialiased, torchvision-compatible)."""
    from PIL import Image

    arr = img
    if arr.dtype != np.uint8:
        arr = np.clip(arr * 255.0, 0, 255).astype(np.uint8)
    pil = Image.fromarray(arr)
    pil = pil.resize((size[1], size[0]), Image.BILINEAR)
    out = np.asarray(pil)
    if img.dtype != np.uint8:
        out = out.astype(np.float32) / 255.0
    return out


def resize_shorter_side(img: np.ndarray, size: int) -> np.ndarray:
    """torchvision ``Resize(size)``: scale so the shorter side == size."""
    h, w = img.shape[:2]
    if h <= w:
        new_h, new_w = size, max(1, int(round(w * size / h)))
    else:
        new_h, new_w = max(1, int(round(h * size / w))), size
    return _resize_pil(img, (new_h, new_w))


def center_crop(img: np.ndarray, size: int) -> np.ndarray:
    h, w = img.shape[:2]
    top = max(0, (h - size) // 2)
    left = max(0, (w - size) // 2)
    return img[top : top + size, left : left + size]


def sample_rrc_box(
    h: int,
    w: int,
    rng: np.random.Generator,
    scale: Tuple[float, float] = (0.08, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> Tuple[int, int, int, int]:
    """torchvision ``RandomResizedCrop`` box sampling: (top, left, ch, cw)."""
    area = h * w
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(*scale)
        aspect = math.exp(rng.uniform(*log_ratio))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            top = int(rng.integers(0, h - ch + 1))
            left = int(rng.integers(0, w - cw + 1))
            return top, left, ch, cw
    # Fallback: center crop to in-range aspect.
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw, ch = w, int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        ch, cw = h, int(round(h * ratio[1]))
    else:
        cw, ch = w, h
    return (h - ch) // 2, (w - cw) // 2, ch, cw


def center_eval_box(h: int, w: int, size: int = 224) -> Tuple[int, int, int, int]:
    """The crop box (in ORIGINAL coordinates) equivalent to torchvision's
    Resize(short=size*256/224) + CenterCrop(size): a centered square of side
    short * 224/256 (up to rounding)."""
    side = int(round(min(h, w) * size / (size * 256 / 224)))
    side = max(1, min(side, min(h, w)))
    return (h - side) // 2, (w - side) // 2, side, side


def random_resized_crop(
    img: np.ndarray,
    rng: np.random.Generator,
    size: int = 224,
    scale: Tuple[float, float] = (0.08, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> np.ndarray:
    """torchvision ``RandomResizedCrop`` semantics: sample area/aspect, crop,
    resize to (size, size); fall back to center crop after 10 tries."""
    h, w = img.shape[:2]
    top, left, ch, cw = sample_rrc_box(h, w, rng, scale, ratio)
    return _resize_pil(img[top : top + ch, left : left + cw], (size, size))


def random_crop_padded(
    img: np.ndarray, rng: np.random.Generator, size: int = 32, padding: int = 4
) -> np.ndarray:
    """CIFAR ``RandomCrop(32, padding=4)``: zero-pad then random crop."""
    padded = np.pad(
        img, ((padding, padding), (padding, padding), (0, 0)), mode="constant"
    )
    top = int(rng.integers(0, 2 * padding + 1))
    left = int(rng.integers(0, 2 * padding + 1))
    return padded[top : top + size, left : left + size]


@dataclass
class Transform:
    """Composable image transform. Call with an HWC uint8/float image.

    Thread-safe: each decode-pool thread gets its own Generator spawned from
    the seed sequence (numpy Generators are not safe to share across
    threads)."""

    kind: str  # 'imagenet_train' | 'imagenet_eval' | 'cifar_train' | 'cifar_eval'
    size: int = 224
    mean: Sequence[float] = IMAGENET_MEAN
    std: Sequence[float] = IMAGENET_STD
    seed: Optional[int] = None
    # When True, the transform stops after the geometric ops and returns
    # uint8 — the caller ships uint8 to the device (4x less host->device
    # traffic than f32, the binding stage on thin links) and normalizes
    # there via ``device_normalize_fn`` (XLA folds it into the first conv).
    device_normalize: bool = False

    def __post_init__(self):
        import threading

        self._seed_seq = np.random.SeedSequence(self.seed)
        self._local = threading.local()
        self._lock = threading.Lock()

    @property
    def rng(self) -> np.random.Generator:
        if not hasattr(self._local, "rng"):
            with self._lock:
                self._local.rng = np.random.default_rng(self._seed_seq.spawn(1)[0])
        return self._local.rng

    # -- fused native-decode support ---------------------------------------
    # The imagenet kinds are exactly "crop box + resize (+ flip + normalize)"
    # operations, so the C++ decode pool can do decode+crop+resize in one
    # native pass (with IDCT-level downscaling). ``crop_geometry`` returns
    # the per-image box/flip; ``finish_batch`` applies flip+normalize to the
    # whole decoded batch at once.

    @property
    def supports_fused_decode(self) -> bool:
        return self.kind in ("imagenet_train", "imagenet_eval")

    def crop_geometry(self, h: int, w: int):
        """-> ((top, left, ch, cw), flip) for a (h, w) source image."""
        if self.kind == "imagenet_train":
            box = sample_rrc_box(h, w, self.rng)
            return box, bool(self.rng.random() < 0.5)
        if self.kind == "imagenet_eval":
            return center_eval_box(h, w, self.size), False
        raise ValueError(f"{self.kind} is not expressible as crop+resize")

    def finish_batch(self, batch_u8: np.ndarray, flips=None) -> np.ndarray:
        """(n, size, size, 3) uint8 + per-image flips -> normalized f32.
        ``flips=None`` means the decode pool already applied them natively
        (mirrored stores during the resize); otherwise they happen here on
        the uint8 data. Normalization runs in place — no (n, H, W, 3) f32
        temporaries."""
        if flips is not None:
            for i, f in enumerate(flips):
                if f:
                    batch_u8[i] = batch_u8[i, :, ::-1].copy()
        if self.device_normalize:
            return batch_u8
        out = batch_u8.astype(np.float32)
        out *= np.float32(1.0 / 255.0)
        out -= np.asarray(self.mean, np.float32)
        out /= np.asarray(self.std, np.float32)
        return out

    def __call__(self, img: np.ndarray) -> np.ndarray:
        if self.kind == "imagenet_train":
            img = random_resized_crop(img, self.rng, self.size)
            if self.rng.random() < 0.5:
                img = img[:, ::-1]
        elif self.kind == "imagenet_eval":
            img = resize_shorter_side(img, int(self.size * 256 / 224))
            img = center_crop(img, self.size)
        elif self.kind == "cifar_train":
            img = random_crop_padded(img, self.rng, self.size)
            if self.rng.random() < 0.5:
                img = img[:, ::-1]
        elif self.kind == "cifar_eval":
            pass
        else:
            raise ValueError(self.kind)
        img = np.ascontiguousarray(img)
        if self.device_normalize:
            return img
        return normalize(to_float(img), self.mean, self.std)


def device_normalize_fn(mean: Sequence[float] = IMAGENET_MEAN,
                        std: Sequence[float] = IMAGENET_STD):
    """Jitted on-device normalize for uint8 batches produced by a
    ``device_normalize=True`` transform: (u8/255 - mean)/std in f32.
    Ship uint8 over the host->device link (4x less traffic than f32 —
    that link, not decode, binds under thin interconnects) and let XLA
    fold this into the first conv."""
    import jax
    import jax.numpy as jnp

    m = jnp.asarray(mean, jnp.float32)
    s = jnp.asarray(std, jnp.float32)

    @jax.jit
    def f(u8):
        return (u8.astype(jnp.float32) * (1.0 / 255.0) - m) / s

    return f


def imagenet_train_transform(size: int = 224, seed: Optional[int] = None,
                             device_normalize: bool = False) -> Transform:
    return Transform("imagenet_train", size, IMAGENET_MEAN, IMAGENET_STD,
                     seed, device_normalize)


def imagenet_eval_transform(size: int = 224, seed: Optional[int] = None,
                            device_normalize: bool = False) -> Transform:
    return Transform("imagenet_eval", size, IMAGENET_MEAN, IMAGENET_STD,
                     seed, device_normalize)


def cifar_train_transform(seed: Optional[int] = None) -> Transform:
    return Transform("cifar_train", 32, CIFAR_MEAN, CIFAR_STD, seed)


def cifar_eval_transform(seed: Optional[int] = None) -> Transform:
    return Transform("cifar_eval", 32, CIFAR_MEAN, CIFAR_STD, seed)
