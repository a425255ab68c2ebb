"""Dynamic micro-batching front end for a batched serving callable.

A deployment receives REQUESTS (single images or small bursts), but the
device wants full batches at the jit-compiled shape: per-query dispatch
wastes the MXU (a 1-query head call costs nearly the same wall time as a
64-query one — tile/dispatch latency dominates) and compiles a separate
program per batch size. ``MicroBatcher`` sits between: concurrent callers
submit items and get futures; a collector thread coalesces items into
batches of up to ``max_batch``, dispatching when full or when the oldest
item has waited ``max_wait_ms``. Short batches are ZERO-PADDED to the one
compiled shape (static shapes for XLA — no per-size recompiles) and the
padding rows are discarded on the way out.

The reference has no serving layer at all (its predict path is called
from the training/eval loop, ``nw.py:127-160``); this is TPU-serving
infrastructure around ``NWNet.make_serving_fn``'s one-dispatch callable.
"""

from __future__ import annotations

import threading
import time
from concurrent.futures import Future
from typing import Callable, Sequence

import numpy as np


class MicroBatcher:
    """Coalesce concurrent single-item requests into fixed-shape batches.

    :param serve_fn: batched callable ``(B, ...) -> (B, C)`` (e.g. from
        ``NWNet.make_serving_fn``); always invoked at exactly
        ``max_batch`` rows.
    :param max_batch: the compiled batch size.
    :param max_wait_ms: latency bound — a non-full batch dispatches once
        its oldest item has waited this long.
    """

    def __init__(
        self,
        serve_fn: Callable,
        max_batch: int = 64,
        max_wait_ms: float = 5.0,
    ) -> None:
        if max_batch < 1:
            raise ValueError(f"max_batch must be >= 1, got {max_batch}")
        self._serve = serve_fn
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self._lock = threading.Condition()
        self._pending: list = []  # [(item, Future), ...]
        self._closed = False
        # Occupancy counters (true take sizes, BEFORE zero-padding to the
        # compiled shape) — the number an operator tunes max_wait_ms by.
        self.dispatches = 0
        self.dispatched_items = 0
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # -- client side ---------------------------------------------------------

    def submit(self, item: np.ndarray) -> Future:
        """Enqueue one item ((H, W, C) image or (D,) features); returns a
        Future resolving to that item's output row."""
        f: Future = Future()
        with self._lock:
            if self._closed:
                raise RuntimeError("MicroBatcher is closed")
            self._pending.append((np.asarray(item), f, time.monotonic()))
            self._lock.notify()
        return f

    def __call__(self, item: np.ndarray):
        """Blocking convenience: submit + wait."""
        return self.submit(item).result()

    def close(self, timeout: float = 10.0) -> None:
        """Drain pending requests and stop the collector thread."""
        with self._lock:
            self._closed = True
            self._lock.notify()
        self._worker.join(timeout)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- collector -----------------------------------------------------------

    def _take_batch(self) -> Sequence:
        """Wait for items; return up to max_batch of them (FIFO). Dispatch
        fires when the batch is full, the oldest item has waited max_wait
        (the latency clock is each item's ARRIVAL time — no collector-side
        state, no races with batches formed while the worker was busy), or
        the batcher is closing with work left."""
        with self._lock:
            while True:
                if self._pending:
                    oldest = self._pending[0][2]
                    if (
                        len(self._pending) >= self.max_batch
                        or self._closed
                        or time.monotonic() - oldest >= self.max_wait
                    ):
                        take = self._pending[: self.max_batch]
                        del self._pending[: len(take)]
                        return take
                    self._lock.wait(
                        timeout=oldest + self.max_wait - time.monotonic()
                    )
                else:
                    if self._closed:
                        return []
                    self._lock.wait()

    def _run(self) -> None:
        while True:
            take = self._take_batch()
            if not take:
                return
            with self._lock:
                self.dispatches += 1
                self.dispatched_items += len(take)
            items = [t[0] for t in take]
            futs = [t[1] for t in take]
            try:
                batch = np.stack(items)
                pad = self.max_batch - len(batch)
                if pad:  # static compiled shape; padded rows discarded
                    batch = np.concatenate(
                        [batch, np.zeros((pad, *batch.shape[1:]), batch.dtype)]
                    )
                out = np.asarray(self._serve(batch))
                for i, f in enumerate(futs):
                    f.set_result(out[i])
            except Exception as e:  # deliver the failure to every caller
                for f in futs:
                    if not f.done():
                        f.set_exception(e)
