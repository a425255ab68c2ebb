"""Three-stage serving pipeline: host decode -> host->device transfer ->
device compute, each stage overlapped with the others.

Why a dedicated transfer stage: the reference's serving loop is
decode -> .to(device) -> forward on one thread (``train.py:404-405``),
which serializes the host->device copy with both neighbors.  On thin
device links (the axon TPU tunnel moves tens of MB/s) a batch of uint8
pixels costs hundreds of milliseconds to ship — comparable to the decode
itself — so the copy must ride its own thread.  The decode pool's workers
are native (no GIL), transfers spend their time in the runtime's copy path,
and device compute is dispatched asynchronously, so the three stages
genuinely overlap and steady-state throughput approaches the slowest
single stage instead of the sum of all three.
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Tuple

import numpy as np


def three_stage_pipeline(
    n_batches: int,
    make_batch: Callable[[int], np.ndarray],
    to_device,
    compute,
    sync,
    decode_depth: int = 2,
) -> float:
    """Run ``n_batches`` through decode/transfer/compute with cross-stage
    overlap; returns elapsed wall-clock seconds.

    ``make_batch(i)`` produces a host batch (runs on up to ``decode_depth``
    threads — the native decode pool underneath fans out further);
    ``to_device`` ships one host batch (dedicated thread, keeps the link
    busy while the next batch decodes); ``compute`` consumes a device batch
    (called on the caller's thread — dispatch must be async); ``sync(out)``
    forces completion of the last output.

    Submission is WINDOWED, not eager: at most ``decode_depth + 2`` host
    batches and 2 device-resident batches are in flight at any moment, so
    memory stays constant in ``n_batches`` (an eager fan-out would pin
    every decoded batch on the host and every transferred batch in device
    HBM for the whole run) while the overlap is identical — each stage
    only ever needs one batch of lookahead to stay busy.
    """
    from collections import deque

    with ThreadPoolExecutor(max_workers=decode_depth) as dec_ex, \
            ThreadPoolExecutor(max_workers=1) as xfer_ex:
        t0 = time.perf_counter()
        dec_q: deque = deque()
        xfer_q: deque = deque()
        next_i = 0

        def pump():
            nonlocal next_i
            while next_i < n_batches and len(dec_q) + len(xfer_q) < decode_depth + 2:
                dec_q.append(dec_ex.submit(make_batch, next_i))
                next_i += 1
            while dec_q and len(xfer_q) < 2:
                f = dec_q.popleft()
                xfer_q.append(xfer_ex.submit(lambda f=f: to_device(f.result())))

        out = None
        for _ in range(n_batches):
            pump()
            dev = xfer_q.popleft().result()
            pump()  # refill while compute dispatches
            out = compute(dev)
            del dev
        sync(out)
        return time.perf_counter() - t0


def synth_photo_jpegs(
    n: int,
    grid=(30, 40),
    block: int = 16,
    quality: int = 90,
    seed: int = 0,
    prefix: str = "nw_jpeg_bench_",
):
    """Write ``n`` synthetic photo-sized JPEGs (grid x block, default
    480x640, quality 90 — the pipeline_bench shape) so JPEG-serving
    benches run without a dataset on disk. Returns the file paths."""
    import tempfile

    from PIL import Image

    rng = np.random.default_rng(seed)
    d = tempfile.mkdtemp(prefix=prefix)
    paths = []
    for i in range(n):
        img = np.kron(
            rng.integers(0, 255, (*grid, 3)), np.ones((block, block, 1))
        ).astype(np.uint8)
        p = f"{d}/{i}.jpg"
        Image.fromarray(img).save(p, quality=quality)
        paths.append(p)
    return paths


def real_photo_jpegs(
    n: int,
    grid=(30, 40),
    block: int = 16,
    quality: int = 90,
    prefix: str = "nw_jpeg_real_",
):
    """Write ``n`` REAL-photograph JPEGs at the bench shape (default
    480x640) from scikit-learn's two bundled photos (``china.jpg`` /
    ``flower.jpg``, 427x640 camera images — on disk in every sklearn
    install, zero egress).  Synthetic block mosaics have pathological
    entropy statistics (huge flat runs → Huffman decode far cheaper than
    on camera noise), so decode rates measured on them flatter the host
    stage; these give the honest number.  Each file gets a distinct
    horizontal roll so content-addressed caches can't collapse the set.
    Returns file paths, or ``None`` when sklearn isn't importable
    (callers fall back to :func:`synth_photo_jpegs`)."""
    import tempfile

    try:
        from sklearn.datasets import load_sample_images
    except Exception:
        return None
    from PIL import Image

    h, w = grid[0] * block, grid[1] * block
    photos = []
    for img in load_sample_images().images:
        img = np.asarray(img, np.uint8)
        # Tile up to the requested canvas (vertical wrap keeps photo
        # statistics; the bundled photos are 427x640 vs the 480x640 bench
        # shape), then crop.
        reps = (h // img.shape[0] + 2, w // img.shape[1] + 2)
        photos.append(np.tile(img, (*reps, 1))[:h, :w])

    d = tempfile.mkdtemp(prefix=prefix)
    paths = []
    for i in range(n):
        img = np.roll(photos[i % len(photos)], 7 * (i // len(photos)), axis=1)
        p = f"{d}/{i}.jpg"
        Image.fromarray(img).save(p, quality=quality)
        paths.append(p)
    return paths


def photo_jpegs(n: int, seed: int = 0, prefix: str = "nw_jpeg_bench_"):
    """Bench JPEG source: real photographs when sklearn is present (the
    normal case), synthetic mosaics otherwise."""
    return real_photo_jpegs(n, prefix=prefix) or synth_photo_jpegs(
        n, seed=seed, prefix=prefix
    )


def jpeg_stage_rates(make_batch, serve, nb: int, bs: int, sync=None):
    """Shared images-in->answers-out measurement methodology: isolated
    per-stage rates (host decode; host->device link; device wall-clock
    per serve call on a DEVICE-RESIDENT batch, incl. dispatch) plus the
    pipelined end-to-end rate through ``three_stage_pipeline``. One
    implementation serves both bench.py and serve.py --jpeg_bench so the
    methodology cannot drift between them.

    ``sync(out)`` must force completion via a host readback (under the
    axon tunnel ``block_until_ready`` does not wait); defaults to
    ``np.asarray``. Returns img/s rates + transfer MB/s + e2e qps."""
    import jax.numpy as jnp

    if sync is None:
        sync = np.asarray

    # Warm both stages (decode pool spin-up + device compile).
    sync(serve(jnp.asarray(make_batch(0))))

    t0 = time.perf_counter()
    for i in range(nb):
        make_batch(i)
    decode_rate = nb * bs / (time.perf_counter() - t0)

    # Device stage: wall-clock per call on a device-resident array —
    # re-shipping would re-pay the host->device copy each rep, and a
    # differential (dispatch-free) rate would overstate the stage on
    # high-latency links where dispatch is tens of ms.
    imgs0 = make_batch(0)
    x0 = jnp.asarray(imgs0)
    out = None
    t0 = time.perf_counter()
    for _ in range(nb):
        out = serve(x0)
    sync(out)
    device_rate = nb * bs / (time.perf_counter() - t0)

    transfer_rate, transfer_mbps = measure_transfer_rate(
        imgs0, jnp.asarray, lambda x: np.asarray(x.reshape(-1)[0])
    )

    dt = three_stage_pipeline(nb, make_batch, jnp.asarray, serve, sync)
    stages = {
        "host_decode": decode_rate,
        "transfer": transfer_rate,
        "device": device_rate,
    }
    return {
        "decode_img_per_sec": round(decode_rate, 1),
        "transfer_img_per_sec": round(transfer_rate, 1),
        "transfer_mb_per_sec": round(transfer_mbps, 1),
        "device_wall_qps": round(device_rate, 1),
        "e2e_qps_from_jpeg": round(nb * bs / dt, 1),
        "bound_by": min(stages, key=stages.get),
    }


def measure_transfer_rate(
    imgs: np.ndarray, to_device, sync, reps: int = 4
) -> Tuple[float, float]:
    """Host->device link rate for one batch shape: (img_per_sec, MB_per_sec).

    Each rep ships a distinct buffer (a fresh copy with a perturbed first
    byte) so a runtime that caches repeated puts of the same host array
    cannot fake the measurement; ``sync`` must force the transfer to finish
    (under the axon tunnel that means a readback, not block_until_ready).
    The first rep is discarded as warmup.
    """
    bufs = []
    for r in range(reps + 1):
        b = imgs.copy()
        b.flat[0] = (int(b.flat[0]) + r + 1) % 256
        bufs.append(b)
    sync(to_device(bufs[0]))  # warmup
    t0 = time.perf_counter()
    for b in bufs[1:]:
        sync(to_device(b))
    dt = time.perf_counter() - t0
    img_per_sec = reps * imgs.shape[0] / dt
    mb_per_sec = reps * imgs.nbytes / dt / 1e6
    return img_per_sec, mb_per_sec
