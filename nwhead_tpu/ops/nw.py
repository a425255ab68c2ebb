"""The Nadaraya-Watson head op (pure-JAX reference implementation).

Semantics match ``NWHead.forward`` in the reference (``nwhead/nw.py:266-289``):

    sy -> one_hot                                  (nw.py:276)
    2-D (unbatched) support broadcasts to batch    (nw.py:277-279)
    scores = kernel(q[:, None, :], s)              (nw.py:283)
    probs  = softmax(scores, axis=-1)              (nw.py:285)
    output = probs @ one_hot(sy)                   (nw.py:287)
    return log(output + 1e-12)                     (nw.py:289)

This module is the *naive* (fully materialized scores) implementation used
for small supports and as the numerical ground truth for the fused Pallas
kernel (``nwhead_tpu.ops.pallas_nw``), which computes the same function with
online softmax so the ``(B, S)`` score matrix never hits HBM.

Extensions over the reference:
  * ``support_mask`` — boolean mask over support positions (False = padding),
    implemented as score = -inf, which XLA's static-shape model needs for
    variable-size supports (knn/full-mode per-class caps).
  * n-query support: ``qfeat`` may be ``(B, D)`` or ``(B, Nq, D)``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from nwhead_tpu.ops.kernels import KernelFn, get_kernel

LOG_FLOOR = 1e-12

_NEG_INF = float("-inf")


def _resolve_kernel(
    kernel: Union[str, KernelFn], kernel_params: Optional[Dict[str, Any]]
) -> Tuple[KernelFn, Dict[str, Any]]:
    if isinstance(kernel, str):
        fn, init_params = get_kernel(kernel)
        return fn, (kernel_params if kernel_params is not None else init_params)
    return kernel, (kernel_params or {})


def _one_hot_labels(sy: jnp.ndarray, n_classes: int) -> jnp.ndarray:
    """One-hot encode integer labels; pass through already-one-hot floats."""
    if jnp.issubdtype(sy.dtype, jnp.floating):
        return sy
    return jax.nn.one_hot(sy, n_classes, dtype=jnp.float32)


def _broadcast_support(
    qfeat: jnp.ndarray, sfeat: jnp.ndarray, sy_onehot: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Normalize shapes to q:(B,Nq,D), s:(B,S,D), sy:(B,S,C)."""
    if qfeat.ndim == 2:
        qfeat = qfeat[:, None, :]  # (B, 1, D) — the reference's unsqueeze(1)
    batch = qfeat.shape[0]
    if sfeat.ndim == 2:  # shared support -> broadcast over batch (nw.py:277-279)
        sfeat = jnp.broadcast_to(sfeat[None], (batch, *sfeat.shape))
    if sy_onehot.ndim == 2:
        sy_onehot = jnp.broadcast_to(sy_onehot[None], (batch, *sy_onehot.shape))
    return qfeat, sfeat, sy_onehot


def nw_scores(
    qfeat: jnp.ndarray,
    sfeat: jnp.ndarray,
    *,
    kernel: Union[str, KernelFn] = "euclidean",
    kernel_params: Optional[Dict[str, Any]] = None,
    support_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Raw similarity scores ``(B, Nq, S)`` (the ``scores_only`` hook the
    reference's legacy head exposes for streaming inference and influence,
    ``legacy/model/classifier.py:14-35``)."""
    kernel_fn, kparams = _resolve_kernel(kernel, kernel_params)
    if qfeat.ndim == 2:
        qfeat = qfeat[:, None, :]
    if sfeat.ndim == 2:
        sfeat = jnp.broadcast_to(sfeat[None], (qfeat.shape[0], *sfeat.shape))
    scores = kernel_fn(kparams, qfeat, sfeat)
    if support_mask is not None:
        mask = support_mask
        if mask.ndim == 1:
            mask = mask[None, :]
        scores = jnp.where(mask[:, None, :], scores, _NEG_INF)
    return scores


def nw_probs_and_weights(
    qfeat: jnp.ndarray,
    sfeat: jnp.ndarray,
    sy: jnp.ndarray,
    n_classes: int,
    *,
    kernel: Union[str, KernelFn] = "euclidean",
    kernel_params: Optional[Dict[str, Any]] = None,
    support_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Class probabilities and per-support softmax weights.

    Returns ``(probs (B, C), weights (B, S))`` for 2-D queries (the weights
    are what ``support_influence`` consumes, ``util/metric.py:23-50``).
    """
    squeeze = qfeat.ndim == 2
    sy_onehot = _one_hot_labels(sy, n_classes)
    q, s, syo = _broadcast_support(qfeat, sfeat, sy_onehot)
    kernel_fn, kparams = _resolve_kernel(kernel, kernel_params)
    scores = kernel_fn(kparams, q, s)  # (B, Nq, S)
    if support_mask is not None:
        mask = support_mask
        if mask.ndim == 1:
            mask = mask[None, :]
        scores = jnp.where(mask[:, None, :], scores, _NEG_INF)
    weights = jax.nn.softmax(scores, axis=-1)  # (B, Nq, S)
    probs = jnp.einsum("bqs,bsc->bqc", weights, syo)  # (B, Nq, C)
    if squeeze:
        return probs[:, 0, :], weights[:, 0, :]
    return probs, weights


def nw_log_probs(
    qfeat: jnp.ndarray,
    sfeat: jnp.ndarray,
    sy: jnp.ndarray,
    n_classes: int,
    *,
    kernel: Union[str, KernelFn] = "euclidean",
    kernel_params: Optional[Dict[str, Any]] = None,
    support_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Log class probabilities ``log(probs + 1e-12)`` — the reference head's
    output contract (``nw.py:289``), reusable directly with an NLL loss.

    qfeat: (B, D) or (B, Nq, D) query features.
    sfeat: (S, D) shared support or (B, S, D) per-query support.
    sy:    integer labels (S,)/(B, S) or one-hot floats (S, C)/(B, S, C).
    """
    probs, _ = nw_probs_and_weights(
        qfeat,
        sfeat,
        sy,
        n_classes,
        kernel=kernel,
        kernel_params=kernel_params,
        support_mask=support_mask,
    )
    return jnp.log(probs + LOG_FLOOR)
