"""Kernel golden tests vs. torch (CPU) reference math.

The torch usage here is test-only oracle computation — the framework itself
is pure JAX."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from nwhead_tpu.ops.kernels import get_kernel, KERNEL_NAMES


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


@pytest.fixture
def xy(rng):
    x = _rand(rng, 2, 3, 16)
    y = _rand(rng, 2, 5, 16)
    return x, y


def test_kernel_names():
    assert set(KERNEL_NAMES) == {
        "euclidean",
        "hypersphere_euclidean",
        "cosine",
        "dotproduct",
        "clip",
    }
    with pytest.raises(NotImplementedError):
        get_kernel("nope")


def test_euclidean_matches_cdist(xy):
    x, y = xy
    fn, params = get_kernel("euclidean")
    got = np.asarray(fn(params, jnp.asarray(x), jnp.asarray(y)))
    want = (-torch.cdist(torch.from_numpy(x), torch.from_numpy(y))).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_hypersphere_euclidean(xy):
    x, y = xy
    fn, params = get_kernel("hypersphere_euclidean")
    got = np.asarray(fn(params, jnp.asarray(x), jnp.asarray(y)))
    tx = F.normalize(torch.from_numpy(x), dim=-1)
    ty = F.normalize(torch.from_numpy(y), dim=-1)
    want = (-torch.cdist(tx, ty)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_cosine(xy):
    x, y = xy
    fn, params = get_kernel("cosine")
    got = np.asarray(fn(params, jnp.asarray(x), jnp.asarray(y)))
    tx = F.normalize(torch.from_numpy(x), dim=-1)
    ty = F.normalize(torch.from_numpy(y), dim=-1)
    want = torch.bmm(tx, ty.transpose(-2, -1)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_dotproduct(xy):
    x, y = xy
    fn, params = get_kernel("dotproduct")
    got = np.asarray(fn(params, jnp.asarray(x), jnp.asarray(y)))
    want = torch.bmm(torch.from_numpy(x), torch.from_numpy(y).transpose(-2, -1)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_clip(xy):
    x, y = xy
    fn, params = get_kernel("clip")
    # Learnable logit scale initialized to log(1/0.07) (reference kernel.py:38).
    np.testing.assert_allclose(float(params["logit_scale"]), np.log(1 / 0.07), rtol=1e-6)
    got = np.asarray(fn(params, jnp.asarray(x), jnp.asarray(y)))
    tx = F.normalize(torch.from_numpy(x), dim=-1)
    ty = F.normalize(torch.from_numpy(y), dim=-1)
    want = (np.exp(np.log(1 / 0.07)) * torch.bmm(tx, ty.transpose(-2, -1))).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_euclidean_grad_finite_at_zero_distance(rng):
    """Gradient must stay finite when query == support point."""
    import jax

    fn, params = get_kernel("euclidean")
    x = jnp.asarray(_rand(rng, 1, 2, 8))
    y = jnp.concatenate([x[:, :1], jnp.asarray(_rand(rng, 1, 3, 8))], axis=1)

    def loss(x):
        return jnp.sum(fn(params, x, y))

    g = jax.grad(loss)(x)
    assert np.all(np.isfinite(np.asarray(g)))
