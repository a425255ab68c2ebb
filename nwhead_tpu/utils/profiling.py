"""Tracing / profiling hooks.

The reference has no profiling at all (SURVEY.md §5.1 — only tqdm bars).
This module provides:
  * ``trace(logdir)`` — context manager around ``jax.profiler`` traces
    (view with TensorBoard / Perfetto);
  * ``StepTimer`` — per-step wall-clock accumulation with percentile
    summaries, readback-safe on the async TPU dispatch path;
  * ``annotate`` — named trace spans for host-side phases (sampling,
    decode, device step).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, List

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (device + host) into ``logdir``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in profiler timelines (host phases)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock phase timing with percentile summaries.

    Use ``block=True`` phases for device work — the timer forces a readback
    so asynchronous dispatch doesn't under-report (the axon tunnel's
    block_until_ready does not wait for completion).
    """

    def __init__(self) -> None:
        self.samples: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def phase(self, name: str, result=None, block: bool = False) -> Iterator[None]:
        t = time.perf_counter()
        yield
        if block and result is not None:
            np.asarray(jax.tree_util.tree_leaves(result)[0])
        self.samples[name].append(time.perf_counter() - t)

    def record(self, name: str, seconds: float) -> None:
        self.samples[name].append(seconds)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self.samples.items():
            arr = np.asarray(xs)
            out[name] = {
                "mean_ms": float(arr.mean() * 1e3),
                "p50_ms": float(np.percentile(arr, 50) * 1e3),
                "p95_ms": float(np.percentile(arr, 95) * 1e3),
                "total_s": float(arr.sum()),
                "count": int(arr.size),
            }
        return out

    def report(self) -> str:
        lines = ["phase                     mean_ms    p50_ms    p95_ms   total_s     n"]
        for name, s in self.summary().items():
            lines.append(
                f"{name:<24} {s['mean_ms']:>9.3f} {s['p50_ms']:>9.3f} "
                f"{s['p95_ms']:>9.3f} {s['total_s']:>9.2f} {s['count']:>5d}"
            )
        return "\n".join(lines)
