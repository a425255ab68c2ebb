"""On-device per-class k-means for cluster-mode inference.

TPU-native equivalent of the reference's per-class sklearn
``KMeans(n_clusters, random_state=0)`` loop (``nwhead/utils.py:218-246``):
instead of C separate host-side fits, all classes are fitted *at once* — one
jitted, vmapped batch of Lloyd iterations over a (C, n_max, d) padded tensor,
so the whole clustering step is a handful of fused XLA ops.

Determinism: kmeans++-style seeding from a fixed JAX PRNG key (the
``random_state=0`` analog). We match the reference's *behavior* (k centroids
per class, deterministic across runs), not sklearn's exact centroid values.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _kmeanspp_init(key, x, mask, k):
    """kmeans++ seeding for one class. x: (n, d), mask: (n,) validity."""
    n = x.shape[0]
    big = jnp.float32(1e30)

    def pick_first(key):
        logits = jnp.where(mask, 0.0, -big)
        return jax.random.categorical(key, logits)

    key, sub = jax.random.split(key)
    first = pick_first(sub)
    centroids = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(x[first])

    def body(i, carry):
        key, centroids = carry
        # Distance to nearest chosen centroid (only first i valid).
        d2 = jnp.sum((x[:, None, :] - centroids[None, :, :]) ** 2, axis=-1)  # (n, k)
        chosen = jnp.arange(k) < i
        d2 = jnp.where(chosen[None, :], d2, big)
        dmin = jnp.min(d2, axis=-1)  # (n,)
        dmin = jnp.where(mask, dmin, 0.0)
        key, sub = jax.random.split(key)
        # Sample proportionally to dmin (kmeans++); fall back to uniform if all 0.
        logits = jnp.where(mask, jnp.log(dmin + 1e-20), -big)
        idx = jax.random.categorical(sub, logits)
        return key, centroids.at[i].set(x[idx])

    key, centroids = jax.lax.fori_loop(1, k, body, (key, centroids))
    return centroids


def _lloyd_one_class(key, x, mask, k, n_iter):
    """Masked Lloyd iterations for one class. Returns (k, d) centroids."""
    centroids = _kmeanspp_init(key, x, mask, k)

    def step(_, centroids):
        d2 = jnp.sum((x[:, None, :] - centroids[None, :, :]) ** 2, axis=-1)  # (n, k)
        assign = jnp.argmin(d2, axis=-1)  # (n,)
        onehot = jax.nn.one_hot(assign, k, dtype=x.dtype) * mask[:, None]  # (n, k)
        counts = jnp.sum(onehot, axis=0)  # (k,)
        sums = jnp.einsum("nk,nd->kd", onehot, x)
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        # Empty clusters keep their previous centroid.
        return jnp.where(counts[:, None] > 0, new, centroids)

    return jax.lax.fori_loop(0, n_iter, step, centroids)


@partial(jax.jit, static_argnames=("n_clusters", "n_iter"))
def batched_kmeans(
    key: jax.Array,
    x: jnp.ndarray,
    mask: jnp.ndarray,
    n_clusters: int,
    n_iter: int = 25,
) -> jnp.ndarray:
    """vmapped Lloyd over classes. x: (C, n_max, d), mask: (C, n_max) ->
    centroids (C, n_clusters, d)."""
    keys = jax.random.split(key, x.shape[0])
    return jax.vmap(lambda k_, x_, m_: _lloyd_one_class(k_, x_, m_, n_clusters, n_iter))(
        keys, x, mask
    )


def compute_clusters(
    embeddings: np.ndarray,
    labels: np.ndarray,
    n_clusters: int,
    closest: bool = False,
    seed: int = 0,
    impl: str = "device",
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-class k-means support construction (``nwhead/utils.py:218-246``).

    Returns ``(sfeat (C * n_clusters, d), slabel (C * n_clusters,))`` where
    class blocks follow ``np.unique(labels)`` order, each repeated
    ``n_clusters`` times — matching the reference layout (``utils.py:232``).

    :param closest: if True, replace each centroid with the nearest real
        support feature (``utils.py:234-240``).
    :param impl: ``"device"`` (default) fits all classes at once with the
        jitted vmapped Lloyd above; ``"sklearn"`` makes the exact
        per-class host call the reference makes —
        ``KMeans(n_clusters, random_state=0).fit`` (``utils.py:230``) —
        so cluster-mode outputs are bit-identical to the reference
        (different k-means local optima are the one source of cluster-mode
        divergence the device path cannot eliminate).
    """
    embeddings = np.asarray(embeddings, dtype=np.float32)
    labels = np.asarray(labels)
    classes = np.unique(labels)
    d = embeddings.shape[1]

    groups = [embeddings[labels == c] for c in classes]

    if impl == "sklearn":
        from sklearn.cluster import KMeans

        sfeat = []
        for g in groups:
            # The reference passes torch tensors, which sklearn's
            # check_array upcasts to float64 (verified: np-f32 vs torch
            # input give different centroids) — fit f64, round to f32
            # exactly like the reference's torch.tensor(...).float().
            km = KMeans(n_clusters=n_clusters, random_state=seed).fit(
                g.astype(np.float64)
            )
            cents = km.cluster_centers_.astype(np.float32)
            if closest:
                d2 = ((cents[:, None, :] - g[None, :, :]) ** 2).sum(-1)
                sfeat.append(g[d2.argmin(-1)])
            else:
                sfeat.append(cents)
        return np.concatenate(sfeat, axis=0), np.repeat(classes, n_clusters)
    if impl != "device":
        raise ValueError(f"Unknown kmeans impl: {impl!r}")

    # Pad per-class features to a common length for the batched device fit.
    n_max = max(len(g) for g in groups)
    x = np.zeros((len(classes), n_max, d), dtype=np.float32)
    mask = np.zeros((len(classes), n_max), dtype=np.float32)
    for i, g in enumerate(groups):
        x[i, : len(g)] = g
        mask[i, : len(g)] = 1.0

    centroids = np.asarray(
        batched_kmeans(jax.random.PRNGKey(seed), jnp.asarray(x), jnp.asarray(mask), n_clusters)
    )  # (C, k, d)

    if closest:
        sfeat = []
        for i, g in enumerate(groups):
            d2 = ((centroids[i][:, None, :] - g[None, :, :]) ** 2).sum(-1)
            nearest = d2.argmin(-1)
            sfeat.append(g[nearest])
        sfeat = np.concatenate(sfeat, axis=0)
    else:
        sfeat = centroids.reshape(-1, d)

    slabel = np.repeat(classes, n_clusters)
    return sfeat, slabel
