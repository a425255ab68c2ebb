"""First-party C++ JPEG decode pool: parity with PIL, fused crop+resize,
dataset integration (SURVEY §2.4 'DataLoader worker pool' native row)."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(12):
        img = np.kron(
            rng.integers(0, 255, (16, 16, 3)), np.ones((10, 10, 1))
        ).astype(np.uint8)
        p = str(d / f"{i}.jpg")
        Image.fromarray(img).save(p, quality=92)
        paths.append(p)
    return paths


def test_decode_matches_pil(jpeg_dir):
    from PIL import Image

    from nwhead_tpu.native.decode import JpegDecodePool, jpeg_dims

    pool = JpegDecodePool(4)
    bufs = pool.decode_batch(jpeg_dir)
    assert jpeg_dims(jpeg_dir[0]) == bufs[0].shape[:2]
    for p, b in zip(jpeg_dir, bufs):
        want = np.asarray(Image.open(p).convert("RGB"))
        np.testing.assert_array_equal(b, want)  # same libjpeg: bit-identical


def test_crop_resize_fused(jpeg_dir):
    from nwhead_tpu.native.decode import JpegDecodePool

    pool = JpegDecodePool(4)
    n = len(jpeg_dir)
    boxes = np.tile(np.array([[20, 20, 100, 100]], np.int32), (n, 1))
    out = pool.decode_crop_resize(jpeg_dir, boxes, (64, 64))
    assert out.shape == (n, 64, 64, 3) and out.dtype == np.uint8
    # Crop content must match a host-side crop+resize of the full decode
    # in broad strokes (different bilinear conventions: compare means).
    full = pool.decode_batch(jpeg_dir[:1])[0]
    crop = full[20:120, 20:120].astype(np.float32)
    assert abs(float(out[0].mean()) - float(crop.mean())) < 8.0


def test_windowed_crop_decode_exact(jpeg_dir):
    """The libjpeg-turbo windowed decode (skip rows above/below the crop,
    restrict columns to the iMCU-aligned window) must reproduce the full
    decode's pixels exactly: a crop box decoded at its own output size makes
    the bilinear an identity sampling, so the result must equal a numpy
    slice of the full decode bit-for-bit."""
    from nwhead_tpu.native.decode import JpegDecodePool

    pool = JpegDecodePool(2)
    full = pool.decode_batch(jpeg_dir[:2])
    boxes = np.array([[37, 21, 80, 96], [13, 49, 100, 72]], np.int32)
    for i in range(2):
        y, x, h, w = (int(v) for v in boxes[i])
        out = pool.decode_crop_resize([jpeg_dir[i]], boxes[i : i + 1], (h, w))
        np.testing.assert_array_equal(out[0], full[i][y : y + h, x : x + w])


def test_native_flip_exact(jpeg_dir):
    """The flip fused into the native resize write must equal a numpy
    column reversal of the unflipped output bit-for-bit — for the bilinear
    path, the crop-at-own-size identity path, and the full-image fast
    path."""
    from nwhead_tpu.native.decode import JpegDecodePool, jpeg_dims

    pool = JpegDecodePool(2)
    boxes = np.array([[10, 14, 90, 110]], np.int32)
    for out_hw in [(64, 64), (90, 110)]:  # resized and identity-sampled
        plain = pool.decode_crop_resize(jpeg_dir[:1], boxes, out_hw)
        flipped = pool.decode_crop_resize(jpeg_dir[:1], boxes, out_hw,
                                          flips=[True])
        np.testing.assert_array_equal(flipped[0], plain[0][:, ::-1])
    h, w = jpeg_dims(jpeg_dir[0])
    plain = pool.decode_crop_resize(jpeg_dir[:1], None, (h, w))
    flipped = pool.decode_crop_resize(jpeg_dir[:1], None, (h, w),
                                      flips=np.array([1], np.uint8))
    np.testing.assert_array_equal(flipped[0], plain[0][:, ::-1])


def test_fractional_idct_scale_close_to_full_decode(photo_jpegs):
    """When the crop is moderately larger than the target (e.g. a 420px
    eval crop -> 224), libjpeg-turbo decodes at the smallest covering M/8
    scale instead of full resolution. The DCT-domain downscale plus
    bilinear must stay close to decode-at-full-scale + PIL resize (it is a
    resampling-kernel difference, not a correctness one)."""
    from PIL import Image

    from nwhead_tpu.native.decode import JpegDecodePool

    pool = JpegDecodePool(2)
    # 480x640 source, centered 420x420 crop -> 224: covering scale is 5/8.
    boxes = np.array([[30, 110, 420, 420]], np.int32)
    out = pool.decode_crop_resize(photo_jpegs[:1], boxes, (224, 224))
    full = np.asarray(Image.open(photo_jpegs[0]).convert("RGB"))
    crop = Image.fromarray(full[30:450, 110:530])
    want = np.asarray(crop.resize((224, 224), Image.BILINEAR), np.float32)
    diff = np.abs(out[0].astype(np.float32) - want)
    assert float(diff.mean()) < 6.0, float(diff.mean())


def test_failures_reported(jpeg_dir, tmp_path):
    from nwhead_tpu.native.decode import JpegDecodePool

    bad = str(tmp_path / "not_a_jpeg.jpg")
    with open(bad, "wb") as f:
        f.write(b"definitely not a jpeg")
    pool = JpegDecodePool(2)
    # Non-JPEG bytes fail at the header probe (dims) or the decode itself.
    with pytest.raises(IOError, match="failed to (decode|read)"):
        pool.decode_batch([jpeg_dir[0], bad])
    # The fixed-size path reports decode failures after the parallel run.
    with pytest.raises(IOError, match="failed to decode"):
        pool.decode_crop_resize([jpeg_dir[0], bad], None, (32, 32))


def test_dataset_native_decoder(jpeg_dir):
    from nwhead_tpu.data.datasets import ImageFileDataset

    targets = np.arange(len(jpeg_dir)) % 3
    ds_native = ImageFileDataset(jpeg_dir, targets, 3, decoder="native")
    ds_pil = ImageFileDataset(jpeg_dir, targets, 3, decoder="pil")
    a = ds_native.gather([0, 3, 5])
    b = ds_pil.gather([0, 3, 5])
    np.testing.assert_array_equal(a, b)


@pytest.fixture(scope="module")
def photo_jpegs(tmp_path_factory):
    """Larger 'photo-like' JPEGs (480x640) for the fused-pipeline tests."""
    from PIL import Image

    d = tmp_path_factory.mktemp("photos")
    rng = np.random.default_rng(1)
    paths = []
    for i in range(6):
        base = rng.integers(0, 255, (30, 40, 3))
        img = np.kron(base, np.ones((16, 16, 1))).astype(np.uint8)
        p = str(d / f"p{i}.jpg")
        Image.fromarray(img).save(p, quality=92)
        paths.append(p)
    return paths


def test_fused_eval_pipeline_close_to_python_path(photo_jpegs):
    """decoder='native_fused' + the deterministic eval transform must agree
    with the decode-then-python path up to bilinear-convention subpixels."""
    from nwhead_tpu.data import transforms as T
    from nwhead_tpu.data.datasets import ImageFileDataset

    targets = np.zeros(len(photo_jpegs), np.int64)
    t = T.imagenet_eval_transform()
    ds_fused = ImageFileDataset(photo_jpegs, targets, 1, transform=t,
                                decoder="native_fused")
    ds_plain = ImageFileDataset(photo_jpegs, targets, 1, transform=t,
                                decoder="pil")
    a = ds_fused.gather([0, 2, 4])
    b = ds_plain.gather([0, 2, 4])
    assert a.shape == b.shape == (3, 224, 224, 3)
    # Normalized units; mean abs difference stays subpixel-ish.
    assert float(np.mean(np.abs(a - b))) < 0.15, float(np.mean(np.abs(a - b)))


def test_fused_train_pipeline_shapes_and_range(photo_jpegs):
    from nwhead_tpu.data import transforms as T
    from nwhead_tpu.data.datasets import ImageFileDataset

    targets = np.zeros(len(photo_jpegs), np.int64)
    t = T.imagenet_train_transform(seed=0)
    ds = ImageFileDataset(photo_jpegs, targets, 1, transform=t,
                          decoder="native_fused")
    out = ds.gather(np.arange(6))
    assert out.shape == (6, 224, 224, 3) and out.dtype == np.float32
    # Normalized imagenet stats: values land in a plausible band.
    assert -3.5 < out.min() and out.max() < 3.5
    # Random crops differ across a re-gather (augmentation actually random).
    out2 = ds.gather(np.arange(6))
    assert np.abs(out - out2).max() > 1e-3


def test_fused_falls_back_for_cifar_kind(photo_jpegs):
    from nwhead_tpu.data import transforms as T
    from nwhead_tpu.data.datasets import ImageFileDataset

    targets = np.zeros(len(photo_jpegs), np.int64)
    t = T.cifar_eval_transform()
    ds = ImageFileDataset(photo_jpegs, targets, 1, transform=t,
                          decoder="native_fused")
    out = ds.gather([0])  # falls back to decode + python transform
    assert out.shape[-1] == 3


def test_rrc_box_semantics():
    """sample_rrc_box respects torchvision's area/ratio bounds."""
    from nwhead_tpu.data.transforms import sample_rrc_box

    rng = np.random.default_rng(0)
    h, w = 480, 640
    for _ in range(200):
        top, left, ch, cw = sample_rrc_box(h, w, rng)
        assert 0 <= top <= h - ch and 0 <= left <= w - cw
        assert 0 < ch <= h and 0 < cw <= w


def test_decode_matches_pil_on_real_photographs():
    """Bit-exactness on REAL camera images (sklearn's bundled photos):
    synthetic block mosaics exercise only trivial Huffman runs, so the
    parity claim needs at least one real-entropy JPEG through the pool."""
    from PIL import Image

    from nwhead_tpu.native.decode import JpegDecodePool
    from nwhead_tpu.utils.pipeline import real_photo_jpegs

    paths = real_photo_jpegs(4, prefix="nw_test_real_")
    assert paths is not None  # sklearn is a baked-in dependency here
    pool = JpegDecodePool(2)
    bufs = pool.decode_batch(paths)
    for p, b in zip(paths, bufs):
        want = np.asarray(Image.open(p).convert("RGB"))
        np.testing.assert_array_equal(b, want)


def test_real_photo_jpegs_shape_and_distinctness():
    from nwhead_tpu.utils.pipeline import real_photo_jpegs

    paths = real_photo_jpegs(5, prefix="nw_test_real2_")
    assert paths is not None and len(paths) == 5
    sizes = [os.path.getsize(p) for p in paths]
    assert len(set(sizes)) >= 4  # rolled crops: files must differ
    from nwhead_tpu.native.decode import jpeg_dims

    assert all(jpeg_dims(p) == (480, 640) for p in paths)
