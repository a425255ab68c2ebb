"""NW head op golden tests vs. a torch oracle of the published formula.

Oracle = one_hot -> kernel -> softmax -> bmm -> log(+1e-12), the op pinned by
the reference README and NWHead.forward (nwhead/nw.py:266-289)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from nwhead_tpu.ops.nw import nw_log_probs, nw_probs_and_weights, nw_scores


def torch_nw_log_probs(q, s, sy, n_classes):
    """Torch oracle for the NW op (shared support)."""
    q = torch.from_numpy(q)
    s = torch.from_numpy(s)
    syo = F.one_hot(torch.from_numpy(sy).long(), n_classes).float()
    b = q.shape[0]
    s = s[None].expand(b, *s.shape)
    syo = syo[None].expand(b, *syo.shape)
    scores = -torch.cdist(q.unsqueeze(1), s)
    probs = F.softmax(scores, dim=-1)
    out = torch.bmm(probs, syo).squeeze(1)
    return torch.log(out + 1e-12).numpy()


@pytest.fixture
def problem(rng):
    B, S, D, C = 4, 12, 16, 5
    q = rng.standard_normal((B, D)).astype(np.float32)
    s = rng.standard_normal((S, D)).astype(np.float32)
    sy = rng.integers(0, C, size=S).astype(np.int32)
    return q, s, sy, C


def test_matches_torch_oracle(problem):
    q, s, sy, C = problem
    got = np.asarray(nw_log_probs(jnp.asarray(q), jnp.asarray(s), jnp.asarray(sy), C))
    want = torch_nw_log_probs(q, s, sy, C)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_probs_sum_to_one(problem):
    q, s, sy, C = problem
    probs, weights = nw_probs_and_weights(
        jnp.asarray(q), jnp.asarray(s), jnp.asarray(sy), C
    )
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(weights).sum(-1), 1.0, rtol=1e-5)


def test_batched_support(problem):
    """Per-query (3-D) support gives same result as manual per-item calls."""
    q, s, sy, C = problem
    B = q.shape[0]
    s_b = np.stack([s + i for i in range(B)])
    sy_b = np.stack([sy for _ in range(B)])
    got = np.asarray(
        nw_log_probs(jnp.asarray(q), jnp.asarray(s_b), jnp.asarray(sy_b), C)
    )
    for i in range(B):
        want_i = np.asarray(
            nw_log_probs(jnp.asarray(q[i : i + 1]), jnp.asarray(s_b[i]), jnp.asarray(sy), C)
        )
        np.testing.assert_allclose(got[i : i + 1], want_i, rtol=1e-5, atol=1e-6)


def test_support_mask_equals_slicing(problem):
    """Masked-out padding positions must be exactly equivalent to a smaller
    support (mask = -inf score -> zero softmax weight)."""
    q, s, sy, C = problem
    keep = 7
    mask = np.zeros(s.shape[0], dtype=bool)
    mask[:keep] = True
    got = np.asarray(
        nw_log_probs(
            jnp.asarray(q), jnp.asarray(s), jnp.asarray(sy), C,
            support_mask=jnp.asarray(mask),
        )
    )
    want = np.asarray(
        nw_log_probs(jnp.asarray(q), jnp.asarray(s[:keep]), jnp.asarray(sy[:keep]), C)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_one_hot_labels_accepted(problem):
    q, s, sy, C = problem
    syo = np.eye(C, dtype=np.float32)[sy]
    a = np.asarray(nw_log_probs(jnp.asarray(q), jnp.asarray(s), jnp.asarray(sy), C))
    b = np.asarray(nw_log_probs(jnp.asarray(q), jnp.asarray(s), jnp.asarray(syo), C))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_grads_flow_to_query_and_support(problem):
    """Training backprops through both query and support features
    (reference trains the joint graph, nw.py:182-184)."""
    q, s, sy, C = problem
    labels = jnp.asarray(np.arange(q.shape[0]) % C)

    def loss(q, s):
        lp = nw_log_probs(q, s, jnp.asarray(sy), C)
        return -jnp.mean(jnp.take_along_axis(lp, labels[:, None], axis=-1))

    gq, gs = jax.grad(loss, argnums=(0, 1))(jnp.asarray(q), jnp.asarray(s))
    assert np.isfinite(np.asarray(gq)).all() and np.abs(np.asarray(gq)).sum() > 0
    assert np.isfinite(np.asarray(gs)).all() and np.abs(np.asarray(gs)).sum() > 0


def test_scores_kernel_variants(problem):
    q, s, sy, C = problem
    for k in ["euclidean", "cosine", "dotproduct", "hypersphere_euclidean", "clip"]:
        out = np.asarray(
            nw_log_probs(jnp.asarray(q), jnp.asarray(s), jnp.asarray(sy), C, kernel=k)
        )
        assert out.shape == (q.shape[0], C)
        assert np.isfinite(out).all()
    sc = nw_scores(jnp.asarray(q), jnp.asarray(s))
    assert sc.shape == (q.shape[0], 1, s.shape[0])
