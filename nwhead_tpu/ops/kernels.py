"""Similarity kernels for the Nadaraya-Watson head.

Functional equivalents of the reference's pluggable kernel modules
(``nwhead/kernel.py:13-97`` in alanqrwang/nwhead): each kernel maps
``(..., num_x, d) x (..., num_y, d) -> (..., num_x, num_y)`` similarity
scores, with distance kernels using a *negative* distance sign convention so
that larger score = more similar.

Kernels are pure functions of ``(params, x, y)``. Only ``clip`` has a
learnable parameter (a scalar ``logit_scale`` initialized to
``log(1/0.07)``, matching the reference ``kernel.py:38``); the rest take an
empty parameter dict. This keeps every kernel jit/vmap/grad-friendly and
lets the caller own parameter state (idiomatic JAX, instead of nn.Module
state).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

KernelFn = Callable[[Dict[str, Any], jnp.ndarray, jnp.ndarray], jnp.ndarray]

# Matches torch.nn.functional.normalize default eps.
_NORMALIZE_EPS = 1e-12


def _l2_normalize(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """L2-normalize along ``axis`` (same clamped-norm semantics as
    ``F.normalize(x, dim=-1)``)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, _NORMALIZE_EPS)


def pairwise_sqdist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared Euclidean distances.

    x: (..., nx, d), y: (..., ny, d) -> (..., nx, ny), clamped to >= 0.

    Uses the expanded |x|^2 + |y|^2 - 2<x,y> form so the inner product rides
    the MXU; the clamp guards the tiny negative values that form produces.
    """
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)  # (..., nx, 1)
    y2 = jnp.sum(y * y, axis=-1, keepdims=True)  # (..., ny, 1)
    xy = jnp.einsum("...xd,...yd->...xy", x, y, precision=jax.lax.Precision.HIGHEST)
    d2 = x2 - 2.0 * xy + jnp.swapaxes(y2, -1, -2)
    return jnp.maximum(d2, 0.0)


def pairwise_dist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Pairwise Euclidean distances (the ``torch.cdist`` equivalent).

    The sqrt has a non-differentiable point at 0; we use the standard
    "sqrt of clamped value, zero gradient at zero" trick so grads stay
    finite when a query coincides with a support point.
    """
    d2 = pairwise_sqdist(x, y)
    # Where d2 == 0 the true subgradient is taken as 0 (torch does the same).
    safe = jnp.where(d2 > 0.0, d2, 1.0)
    return jnp.where(d2 > 0.0, jnp.sqrt(safe), 0.0)


def euclidean(params: Dict[str, Any], x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """-cdist(x, y). Reference: ``kernel.py:13-15``."""
    del params
    return -pairwise_dist(x, y)


def hypersphere_euclidean(
    params: Dict[str, Any], x: jnp.ndarray, y: jnp.ndarray
) -> jnp.ndarray:
    """-cdist on L2-normalized inputs. Reference: ``kernel.py:17-21``."""
    del params
    return -pairwise_dist(_l2_normalize(x), _l2_normalize(y))


def cosine(params: Dict[str, Any], x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Cosine similarity. Reference: ``kernel.py:23-28``."""
    del params
    x = _l2_normalize(x)
    y = _l2_normalize(y)
    return jnp.einsum("...xd,...yd->...xy", x, y, precision=jax.lax.Precision.HIGHEST)


def dotproduct(params: Dict[str, Any], x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Raw inner-product similarity. Reference: ``kernel.py:30-33``."""
    del params
    return jnp.einsum("...xd,...yd->...xy", x, y, precision=jax.lax.Precision.HIGHEST)


def clip(params: Dict[str, Any], x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """CLIP-style cosine similarity with learnable temperature.

    ``exp(logit_scale) * cos(x, y)`` with ``logit_scale`` trainable,
    initialized to ``log(1/0.07)``. Reference: ``kernel.py:35-44``.
    """
    scale = jnp.exp(params["logit_scale"])
    return scale * cosine({}, x, y)


def _clip_init() -> Dict[str, Any]:
    return {"logit_scale": jnp.asarray(math.log(1.0 / 0.07), dtype=jnp.float32)}


class RelationNetwork:
    """Learned conv relation kernel (parity with the reference's
    ``RelationNetwork``, ``kernel.py:46-78`` — defined there but commented
    out of the factory ``kernel.py:91-94``; likewise not registered here).

    Scores feature-map pairs with a small conv net:
    ``score(x, y) = -sigmoid(MLP(conv(|x - y|)))`` when ``symmetric``.
    Operates on 4-D feature maps (n, h, w, c), not pooled vectors.
    """

    def __init__(self, in_ch_size: int, input_size: int, hidden_size: int, symmetric: bool = True):
        import flax.linen as nn

        class _Relation(nn.Module):
            hidden: int

            @nn.compact
            def __call__(self, d, train: bool = True):
                for _ in range(2):
                    d = nn.Conv(64, (3, 3), padding=[(1, 1), (1, 1)])(d)
                    d = nn.BatchNorm(use_running_average=not train, momentum=0.0)(d)
                    d = nn.relu(d)
                    d = nn.max_pool(d, (2, 2), strides=(2, 2))
                d = d.reshape(d.shape[0], -1)
                d = nn.relu(nn.Dense(self.hidden)(d))
                return jax.nn.sigmoid(nn.Dense(1)(d))

        self.module = _Relation(hidden=hidden_size)
        self.symmetric = symmetric

    def apply(self, variables, x, y, train: bool = False):
        """x: (bs, nq, h, w, c), y: (bs, ns, h, w, c) -> (bs, nq, ns)."""
        assert self.symmetric, "only the symmetric |x - y| variant is defined"
        bs, nq = x.shape[:2]
        ns = y.shape[1]
        diff = jnp.abs(x[:, :, None] - y[:, None, :, :])  # (bs, nq, ns, h, w, c)
        flat = diff.reshape(-1, *diff.shape[3:])
        scores = -self.module.apply(variables, flat, train=train)
        return scores.reshape(bs, nq, ns)

    def init(self, rng, x, y):
        bs, nq = x.shape[:2]
        diff = jnp.abs(x[:, :1] - y[:, :1])
        return self.module.init(rng, diff.reshape(-1, *diff.shape[2:]), train=False)


_KERNELS: Dict[str, Tuple[KernelFn, Callable[[], Dict[str, Any]]]] = {
    "euclidean": (euclidean, dict),
    "hypersphere_euclidean": (hypersphere_euclidean, dict),
    "cosine": (cosine, dict),
    "dotproduct": (dotproduct, dict),
    "clip": (clip, _clip_init),
}

KERNEL_NAMES = tuple(_KERNELS)


def get_kernel(kernel_type: str) -> Tuple[KernelFn, Dict[str, Any]]:
    """Kernel factory. Returns ``(kernel_fn, init_params)``.

    Mirrors the reference factory's valid names (``kernel.py:80-97``); raises
    ``NotImplementedError`` for unknown names, like the reference.
    """
    if kernel_type not in _KERNELS:
        raise NotImplementedError(
            f"Unknown kernel type {kernel_type!r}; valid: {KERNEL_NAMES}"
        )
    fn, init = _KERNELS[kernel_type]
    return fn, init()
