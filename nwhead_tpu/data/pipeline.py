"""Prefetching host->device input pipeline.

The reference's DataLoader host workers (``train.py:190-196``) put decode on
the critical path of every step (SURVEY.md §3.1). Here a background thread
pipelines (sample -> decode -> transform -> collate) against device compute,
with double-buffered ``jax.device_put`` so step N+1's batch is on the device
before step N finishes.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import jax
import numpy as np


class BatchLoader:
    """Minibatch iterator over a dataset with ``gather``.

    shuffle=True reshuffles each epoch (torch DataLoader semantics);
    drop_last keeps shapes static for jit.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = True,
    ) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        n = len(self.dataset)
        order = self.rng.permutation(n) if self.shuffle else np.arange(n)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, stop, self.batch_size):
            idx = order[start : start + self.batch_size]
            imgs = self.dataset.gather(idx)
            yield imgs, self.dataset.targets[idx]


def prefetch_to_device(iterator, size: int = 2, devices=None):
    """Wrap a host batch iterator with a background thread + device_put.

    Yields device-resident pytrees ``size`` batches ahead of consumption.
    """
    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()
    err: list = []

    def producer():
        try:
            for item in iterator:
                q.put(jax.device_put(item))
        except BaseException as e:  # surface worker errors to the consumer
            err.append(e)
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            if err:
                raise err[0]
            return
        yield item


class EpisodicBatcher:
    """Fused query+support batch construction for NW training.

    Each step: draw a query minibatch, ask the support engine for an episode
    conditioned on the query labels, and gather both image sets in one host
    pass — the whole thing prefetched off the critical path.
    """

    def __init__(
        self,
        dataset,
        support_train,
        batch_size: int,
        seed: int = 0,
    ) -> None:
        self.dataset = dataset
        self.support_train = support_train
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)

    def epoch(self, steps: Optional[int] = None):
        n = len(self.dataset)
        order = self.rng.permutation(n)
        stop = (n // self.batch_size) * self.batch_size
        count = 0
        for start in range(0, stop, self.batch_size):
            if steps is not None and count >= steps:
                return
            qidx = order[start : start + self.batch_size]
            qy = self.dataset.targets[qidx]
            sidx, sy, sm = self.support_train.get_support(qy)
            qimg = self.dataset.gather(qidx)
            simg = self.dataset.gather(sidx)
            yield qimg, qy, simg, sy, sm
            count += 1
