"""Support influence — the flagship explainability op.

Closed-form leave-one-out influence of each support example on a query's
prediction, per the reference ``util/metric.py:23-50``:

    influence_i = L(softmax renormalized without support i, qlabel) - L(softmax, qlabel)
                = log( (p - p * w_i) / (p - w_i * 1[y_i == y_q]) )

where ``p`` is the predicted probability of the query's true class and
``w_i`` the softmax weight on support ``i``. Positive influence => removing
support example i would increase the loss => it was helpful.

The reference loops over batch items in Python and documents "bs should be
1"; here the whole computation is one batched expression (any batch size),
per the build plan (SURVEY.md §7.1).
"""

from __future__ import annotations

import jax.numpy as jnp


def support_influence(
    softmaxes: jnp.ndarray,
    qlabels: jnp.ndarray,
    sweights: jnp.ndarray,
    slabels: jnp.ndarray,
) -> jnp.ndarray:
    """Vectorized leave-one-out support influence.

    softmaxes: (B, C) query class probabilities (post-softmax).
    qlabels:   (B,) int labels or (B, C) one-hot.
    sweights:  (B, S) softmax weights between each query and support item.
    slabels:   (S,) / (B, S) int labels or (S, C) / (B, S, C) one-hot.
    Returns:   (B, S) influence of each support item on each query.
    """
    if qlabels.ndim == 2:  # one-hot -> categorical
        qcat = jnp.argmax(qlabels, axis=-1)  # (B,)
    else:
        qcat = qlabels
    if jnp.issubdtype(slabels.dtype, jnp.floating):  # one-hot -> categorical
        scat = jnp.argmax(slabels, axis=-1)
    else:
        scat = slabels
    if scat.ndim == 1:
        scat = scat[None, :]  # shared support broadcasts over batch

    # p: (B, 1) prob of the true class; indicator: (B, S)
    p = jnp.take_along_axis(softmaxes, qcat[:, None], axis=-1)
    indicator = (scat == qcat[:, None]).astype(sweights.dtype)
    return jnp.log((p - p * sweights) / (p - sweights * indicator))
