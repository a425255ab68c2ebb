"""Post-hoc temperature scaling for NW-head (or any) log-probabilities.

The NW head's selling point is calibrated classification (the paper the
reference implements, arXiv:2212.03411), and the reference vendors its ECE
metric from gpleiss/temperature_scaling (``util/metric.py:75-112``) — but
never ships the scaling step itself. This module completes that story:
fit a single scalar temperature ``T`` on held-out log-probs by minimizing
NLL, then serve ``log_softmax(log_probs / T)``.

The NW head emits ``log(probs + 1e-12)``; treating those log-probs as
logits makes temperature scaling the standard ``softmax(log p / T)``
sharpening/flattening of the predictive distribution (T=1 is an exact
no-op up to the log-floor epsilon; T > 1 flattens overconfident models).

The 1-D NLL objective is convex in ``log T`` for all practical purposes;
we fit with a fixed-iteration golden-section search over ``log T`` —
deterministic, jit-friendly (``lax.fori_loop``), no optimizer state, and
immune to the line-search pathologies LBFGS hits on tiny val sets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nwhead_tpu.ops.metrics import nll_loss

_PHI = (5.0**0.5 - 1.0) / 2.0  # golden ratio conjugate


def apply_temperature(log_probs: jnp.ndarray, T) -> jnp.ndarray:
    """Rescale a (B, C) log-prob matrix by temperature ``T`` and
    renormalize: ``log_softmax(log_probs / T)``."""
    return jax.nn.log_softmax(log_probs / T, axis=-1)


def _nll_at_logt(log_probs, labels, log_t):
    return nll_loss(apply_temperature(log_probs, jnp.exp(log_t)), labels)


def fit_temperature(
    log_probs: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    lo: float = -3.0,
    hi: float = 3.0,
    iters: int = 40,
) -> jnp.ndarray:
    """Fit the NLL-minimizing temperature on held-out predictions.

    log_probs: (B, C) validation log-probabilities; labels: (B,) int.
    Searches ``T ∈ [e^lo, e^hi]`` (≈ [0.05, 20]). Proper golden-section:
    one interior point and its NLL are carried across iterations, so each
    iteration costs ONE full-(B, C) NLL evaluation; 40 iterations shrink
    the bracket below f32 resolution. Returns a scalar ``T``.
    """
    log_probs = jnp.asarray(log_probs, jnp.float32)
    labels = jnp.asarray(labels)

    def nll(log_t):
        return _nll_at_logt(log_probs, labels, log_t)

    a0, b0 = jnp.float32(lo), jnp.float32(hi)
    c0 = b0 - _PHI * (b0 - a0)
    d0 = a0 + _PHI * (b0 - a0)

    def body(_, state):
        a, b, c, d, fc, fd = state

        def shrink_right():  # minimum in (a, d): d becomes b, c becomes d
            b2, d2, fd2 = d, c, fc
            c2 = b2 - _PHI * (b2 - a)
            return a, b2, c2, d2, nll(c2), fd2

        def shrink_left():  # minimum in (c, b): c becomes a, d becomes c
            a2, c2, fc2 = c, d, fd
            d2 = a2 + _PHI * (b - a2)
            return a2, b, c2, d2, fc2, nll(d2)

        return jax.lax.cond(fc < fd, shrink_right, shrink_left)

    a, b, *_ = jax.lax.fori_loop(
        0, iters, body, (a0, b0, c0, d0, nll(c0), nll(d0))
    )
    return jnp.exp((a + b) / 2.0)
