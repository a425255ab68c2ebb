"""Streaming full-mode inference over a host-resident feature bank.

Capability parity with the legacy streaming path
(``legacy/model/net.py:53-72``), which filled a materialized ``(bs, N)``
score matrix chunk-by-chunk from an embedding loader and softmaxed at the
end. Here each host chunk updates exact online-softmax partials on device —
one pass, O(bs x chunk) device memory, no materialized score matrix — so the
bank can exceed device HBM (it lives wherever the iterator reads from: host
RAM, disk, a remote store).

For banks that *fit* in HBM use the fused Pallas kernel
(``ops.pallas_nw``); for banks sharded across a pod use
``parallel.ShardedSupportBank``. This module covers the third regime.
"""

from __future__ import annotations

from functools import partial
from typing import Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nwhead_tpu.ops.nw import LOG_FLOOR
from nwhead_tpu.parallel.sharded_bank import nw_partials

_NEG_INF = float(jnp.finfo(jnp.float32).min)


@partial(jax.jit, static_argnames=("n_classes", "kernel"))
def _update_partials(qfeat, sfeat, sy, mask, m, l, acc, *, n_classes, kernel):
    """Merge one support chunk into running (m, l, acc)."""
    m_c, l_c, acc_c = nw_partials(qfeat, sfeat, sy, mask, n_classes, kernel=kernel)
    m_new = jnp.maximum(m, m_c)
    m_safe = jnp.where(m_new > _NEG_INF / 2, m_new, 0.0)
    a_old = jnp.where(m > _NEG_INF / 2, jnp.exp(m - m_safe), 0.0)
    a_chunk = jnp.where(m_c > _NEG_INF / 2, jnp.exp(m_c - m_safe), 0.0)
    return (
        m_new,
        l * a_old + l_c * a_chunk,
        acc * a_old + acc_c * a_chunk,
    )


def nw_streaming_log_probs(
    qfeat: jnp.ndarray,
    chunks: Iterable[Tuple[np.ndarray, np.ndarray]],
    n_classes: int,
    kernel: str = "euclidean",
    chunk_size: Optional[int] = None,
) -> jnp.ndarray:
    """NW log-probs over a streamed support bank.

    qfeat: (B, D) query features (device).
    chunks: iterable of (features (n_i, D), labels (n_i,)) host arrays —
        e.g. an embedding loader reading precomputed features from disk
        (the legacy ``EmbeddingDataset`` flow, ``legacy/data/embedding.py``).
    chunk_size: pad every chunk to this static size (one XLA program for the
        whole stream); defaults to the first chunk's length.

    Mathematically identical to single-shot full-mode (online softmax is
    exact); returns ``log(probs + 1e-12)``.
    """
    B = qfeat.shape[0]
    m = jnp.full((B, 1), _NEG_INF, jnp.float32)
    l = jnp.zeros((B, 1), jnp.float32)
    acc = jnp.zeros((B, n_classes), jnp.float32)

    for feats, labels in chunks:
        feats = np.asarray(feats, dtype=np.float32)
        labels = np.asarray(labels)
        n = len(feats)
        if chunk_size is None:
            chunk_size = n
        pad = chunk_size - n
        assert pad >= 0, f"chunk of {n} exceeds chunk_size={chunk_size}"
        mask = np.ones(chunk_size, np.float32)
        if pad:
            feats = np.concatenate([feats, np.zeros((pad, feats.shape[1]), np.float32)])
            labels = np.concatenate([labels, np.zeros(pad, labels.dtype)])
            mask[n:] = 0.0
        m, l, acc = _update_partials(
            qfeat,
            jnp.asarray(feats),
            jnp.asarray(labels.astype(np.int32)),
            jnp.asarray(mask),
            m,
            l,
            acc,
            n_classes=n_classes,
            kernel=kernel,
        )

    probs = acc / jnp.maximum(l, 1e-30)
    return jnp.log(probs + LOG_FLOOR)
