"""Metrics: accuracy, ROC-AUC, 15-bin ECE, NLL losses, running accumulator.

Pure-JAX equivalents of the reference's sklearn/torch metrics
(``util/metric.py``): ``acc`` (accuracy_score), ``roc`` (roc_auc_score),
``ECELoss`` (15-bin expected calibration error from gpleiss/temperature_scaling),
``Metric`` (running weighted mean), and ``SmoothNLLLoss``. Everything that
touches arrays is jittable; ``Metric`` is host-side bookkeeping.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def acc(pred: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Accuracy of categorical predictions (``util/metric.py:10-14``)."""
    pred = jnp.asarray(pred)
    targets = jnp.asarray(targets)
    return jnp.mean((pred == targets).astype(jnp.float32))


def roc(pr: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """100 * ROC-AUC for binary ground truth (``util/metric.py:16-21``).

    Computed via the Mann-Whitney U statistic (rank formulation) — exact for
    distinct scores and midrank-corrected for ties, matching sklearn's
    trapezoidal result.
    """
    pr = jnp.asarray(pr, dtype=jnp.float32).reshape(-1)
    gt = jnp.asarray(gt).reshape(-1).astype(jnp.float32)

    order = jnp.argsort(pr)
    sorted_pr = pr[order]
    # Midranks (1-based), averaging over tied groups.
    n = pr.shape[0]
    idx = jnp.arange(n, dtype=jnp.float32)
    # For each element find first/last index of its tied group.
    first = jnp.searchsorted(sorted_pr, sorted_pr, side="left").astype(jnp.float32)
    last = jnp.searchsorted(sorted_pr, sorted_pr, side="right").astype(jnp.float32)
    midranks_sorted = (first + last - 1.0) / 2.0 + 1.0
    del idx
    ranks = jnp.zeros(n, dtype=jnp.float32).at[order].set(midranks_sorted)

    n_pos = jnp.sum(gt)
    n_neg = n - n_pos
    rank_sum_pos = jnp.sum(ranks * gt)
    auc = (rank_sum_pos - n_pos * (n_pos + 1.0) / 2.0) / (n_pos * n_neg)
    return 100.0 * auc


def ece(softmaxes: jnp.ndarray, labels: jnp.ndarray, n_bins: int = 15) -> jnp.ndarray:
    """Expected Calibration Error over equally spaced confidence bins.

    Bin membership uses ``conf > lower and conf <= upper`` and empty bins
    contribute zero, matching the reference (``util/metric.py:98-112``).
    Returns a scalar in [0, 1] (the reference's train loop multiplies by 100).
    """
    softmaxes = jnp.asarray(softmaxes)
    labels = jnp.asarray(labels)
    confidences = jnp.max(softmaxes, axis=1)
    predictions = jnp.argmax(softmaxes, axis=1)
    accuracies = (predictions == labels).astype(jnp.float32)

    boundaries = jnp.linspace(0.0, 1.0, n_bins + 1)
    lowers, uppers = boundaries[:-1], boundaries[1:]

    # (n_bins, N) membership masks — vectorized over bins.
    in_bin = (confidences[None, :] > lowers[:, None]) & (
        confidences[None, :] <= uppers[:, None]
    )
    in_bin = in_bin.astype(jnp.float32)
    counts = jnp.sum(in_bin, axis=1)  # (n_bins,)
    prop_in_bin = counts / confidences.shape[0]

    safe_counts = jnp.maximum(counts, 1.0)
    acc_in_bin = jnp.sum(in_bin * accuracies[None, :], axis=1) / safe_counts
    conf_in_bin = jnp.sum(in_bin * confidences[None, :], axis=1) / safe_counts

    gaps = jnp.abs(conf_in_bin - acc_in_bin) * prop_in_bin
    return jnp.sum(jnp.where(counts > 0, gaps, 0.0))


def nll_loss(log_probs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean negative log-likelihood on log-probabilities (torch ``NLLLoss``)."""
    picked = jnp.take_along_axis(log_probs, targets[:, None], axis=-1)
    return -jnp.mean(picked)


def nll_loss_onehot(log_probs: jnp.ndarray, targets_onehot: jnp.ndarray) -> jnp.ndarray:
    """NLL on one-hot targets (legacy ``loss_ops.NLLLoss``,
    ``legacy/loss/loss_ops.py:4-12``)."""
    return -jnp.mean(jnp.sum(targets_onehot * log_probs, axis=-1))


def label_smoothing_loss_onehot(
    log_probs: jnp.ndarray, targets_onehot: jnp.ndarray, smoothing: float = 0.1
) -> jnp.ndarray:
    """Label-smoothing NLL on one-hot targets (legacy
    ``loss_ops.LabelSmoothingLoss``, ``legacy/loss/loss_ops.py:14-28``)."""
    n_classes = log_probs.shape[-1]
    smoothed = targets_onehot * (1.0 - smoothing) + smoothing / n_classes
    return -jnp.mean(jnp.sum(smoothed * log_probs, axis=-1))


def smooth_nll_loss(
    log_probs: jnp.ndarray,
    targets: jnp.ndarray,
    smoothing: float = 0.0,
    weight: Optional[jnp.ndarray] = None,
    reduction: str = "mean",
) -> jnp.ndarray:
    """Label-smoothing NLL on log-probabilities (``util/metric.py:114-142``)."""
    assert 0.0 <= smoothing < 1.0
    n_classes = log_probs.shape[-1]
    smoothed = jnp.full_like(log_probs, smoothing / (n_classes - 1))
    smoothed = jax.vmap(lambda row, t: row.at[t].set(1.0 - smoothing))(
        smoothed, targets
    )
    if weight is not None:
        log_probs = log_probs * weight[None, :]
    loss = -jnp.sum(smoothed * log_probs, axis=-1)
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


class Metric:
    """Running weighted mean accumulator (``util/metric.py:52-72``)."""

    def __init__(self) -> None:
        self.tot_val = 0.0
        self.num_samples = 0

    def update_state(self, val, samples: int) -> None:
        val = float(np.asarray(val))
        self.num_samples += samples
        self.tot_val += val * samples

    def result(self) -> float:
        if self.num_samples == 0:
            return 0
        return self.tot_val / self.num_samples

    def reset_state(self) -> None:
        self.tot_val = 0.0
        self.num_samples = 0
