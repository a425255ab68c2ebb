"""Fused attention kernel (ops/pallas_attn.py) vs the naive XLA chain."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nwhead_tpu.ops.pallas_attn import fused_attention


def _naive(q, k, v, scale):
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", attn, v)


@pytest.mark.parametrize("N,hd", [(257, 64), (128, 128), (100, 32)])
def test_fused_attention_matches_naive_f32(rng, N, hd):
    B, H = 2, 3
    q = jnp.asarray(rng.standard_normal((B, H, N, hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, N, hd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, N, hd)).astype(np.float32))
    scale = 1.0 / hd ** 0.5
    got = np.asarray(fused_attention(q, k, v, scale=scale))
    want = np.asarray(_naive(q, k, v, scale))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_fused_attention_bf16(rng):
    B, H, N, hd = 2, 2, 130, 64
    mk = lambda: jnp.asarray(
        rng.standard_normal((B, H, N, hd)).astype(np.float32)
    ).astype(jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    got = np.asarray(fused_attention(q, k, v).astype(jnp.float32))
    want = np.asarray(
        _naive(q, k, v, 1.0 / hd ** 0.5).astype(jnp.float32)
    )
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)


def test_rows_are_proper_distributions(rng):
    """Padded key columns must carry zero probability mass: out equals
    attention restricted to the true N."""
    B, H, N, hd = 1, 1, 5, 8
    q = jnp.asarray(rng.standard_normal((B, H, N, hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, N, hd)).astype(np.float32))
    # v rows beyond N would poison the output if padding leaked.
    v = jnp.asarray(np.full((B, H, N, hd), 7.0, np.float32))
    out = np.asarray(fused_attention(q, k, v))
    np.testing.assert_allclose(out, 7.0, rtol=1e-5)
