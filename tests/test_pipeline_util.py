"""Tests for the three-stage serving pipeline helper.

The helper replaces the reference's single-thread decode -> .to(device) ->
forward serving loop (``/root/reference/train.py:404-405``): all three
stages must genuinely overlap, so steady-state wall clock tracks the
slowest stage instead of the sum of all three.
"""

import threading
import time

import numpy as np

from nwhead_tpu.utils.pipeline import (
    measure_transfer_rate,
    three_stage_pipeline,
)


def test_overlap_beats_serial():
    """With decode/transfer/compute each sleeping d seconds per batch, the
    serial loop costs ~3*n*d while the pipeline costs ~(n+2)*d — require
    the pipeline to land well under 2*n*d."""
    d, n = 0.03, 8

    def make_batch(i):
        time.sleep(d)
        return np.full((4,), i, np.int32)

    def to_device(b):
        time.sleep(d)
        return b

    outs = []

    def compute(b):
        time.sleep(d)
        outs.append(int(b[0]))
        return b

    dt = three_stage_pipeline(n, make_batch, to_device, compute, sync=lambda o: o)
    assert outs == list(range(n)), "batch order must be preserved"
    assert dt < 2 * n * d, f"no overlap: {dt:.3f}s vs serial {3 * n * d:.3f}s"


def test_stages_run_on_distinct_threads():
    seen = {"decode": set(), "xfer": set(), "compute": set()}

    def make_batch(i):
        seen["decode"].add(threading.get_ident())
        return np.zeros((2,), np.float32)

    def to_device(b):
        seen["xfer"].add(threading.get_ident())
        return b

    def compute(b):
        seen["compute"].add(threading.get_ident())
        return b

    three_stage_pipeline(4, make_batch, to_device, compute, sync=lambda o: o)
    main = threading.get_ident()
    assert main not in seen["decode"] and main not in seen["xfer"]
    assert seen["compute"] == {main}, "compute dispatch stays on the caller"
    assert len(seen["xfer"]) == 1, "transfer rides one dedicated thread"


def test_transfer_rate_distinct_buffers():
    shipped = []

    def to_device(b):
        shipped.append(b.flat[0])
        time.sleep(0.01)
        return b

    imgs = np.zeros((8, 4, 4, 3), np.uint8)
    img_rate, mbps = measure_transfer_rate(imgs, to_device, sync=lambda o: o,
                                           reps=3)
    # warmup + 3 timed reps, every buffer distinct (defeats put-caching)
    assert len(shipped) == 4 and len(set(shipped)) == 4
    assert img_rate > 0 and mbps > 0
    # 3 reps x 8 imgs over >= 0.03s -> well under the free-run bound
    assert img_rate <= 24 / 0.03
