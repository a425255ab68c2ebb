"""Metric golden tests vs. sklearn/torch oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from nwhead_tpu.ops import metrics
from nwhead_tpu.ops.influence import support_influence
from nwhead_tpu.ops.nw import nw_probs_and_weights


def test_acc():
    pred = np.array([0, 1, 2, 2])
    gt = np.array([0, 1, 1, 2])
    assert float(metrics.acc(pred, gt)) == pytest.approx(0.75)


def test_roc_matches_sklearn(rng):
    from sklearn.metrics import roc_auc_score

    pr = rng.standard_normal(200).astype(np.float32)
    gt = (rng.random(200) > 0.5).astype(np.int32)
    got = float(metrics.roc(pr, gt))
    want = 100.0 * roc_auc_score(gt, pr)
    assert got == pytest.approx(want, abs=1e-3)


def test_roc_with_ties(rng):
    from sklearn.metrics import roc_auc_score

    pr = rng.integers(0, 5, size=100).astype(np.float32)  # heavy ties
    gt = (rng.random(100) > 0.4).astype(np.int32)
    got = float(metrics.roc(pr, gt))
    want = 100.0 * roc_auc_score(gt, pr)
    assert got == pytest.approx(want, abs=1e-3)


def test_ece_matches_torch_reference(rng):
    """Oracle: the gpleiss/temperature_scaling 15-bin ECE (the formula the
    reference vendors at util/metric.py:75-112)."""
    import torch

    N, C = 500, 10
    logits = rng.standard_normal((N, C)).astype(np.float32)
    softmaxes = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    labels = rng.integers(0, C, size=N)

    t_soft = torch.from_numpy(softmaxes)
    t_lab = torch.from_numpy(labels)
    conf, pred = torch.max(t_soft, dim=1)
    accs = pred.eq(t_lab)
    bounds = torch.linspace(0, 1, 16)
    want = torch.zeros(1)
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        in_bin = conf.gt(lo.item()) * conf.le(hi.item())
        prop = in_bin.float().mean()
        if prop.item() > 0:
            want += torch.abs(conf[in_bin].mean() - accs[in_bin].float().mean()) * prop

    got = float(metrics.ece(softmaxes, labels))
    assert got == pytest.approx(float(want), abs=1e-5)


def test_nll_loss(rng):
    import torch
    import torch.nn.functional as F

    lp = np.log(np.random.default_rng(1).dirichlet(np.ones(5), size=8)).astype(
        np.float32
    )
    t = np.array([0, 1, 2, 3, 4, 0, 1, 2])
    got = float(metrics.nll_loss(jnp.asarray(lp), jnp.asarray(t)))
    want = float(F.nll_loss(torch.from_numpy(lp), torch.from_numpy(t)))
    assert got == pytest.approx(want, abs=1e-5)


def test_smooth_nll_matches_plain_when_zero_smoothing(rng):
    lp = np.log(np.random.default_rng(2).dirichlet(np.ones(5), size=8)).astype(
        np.float32
    )
    t = np.array([0, 1, 2, 3, 4, 0, 1, 2])
    a = float(metrics.nll_loss(jnp.asarray(lp), jnp.asarray(t)))
    b = float(metrics.smooth_nll_loss(jnp.asarray(lp), jnp.asarray(t), smoothing=0.0))
    assert a == pytest.approx(b, abs=1e-5)


def test_metric_accumulator():
    m = metrics.Metric()
    assert m.result() == 0
    m.update_state(1.0, 2)
    m.update_state(4.0, 2)
    assert m.result() == pytest.approx(2.5)
    m.reset_state()
    assert m.result() == 0


def test_support_influence_matches_torch_loop(rng):
    """Oracle: the reference's per-item loop formula (util/metric.py:35-49)."""
    import torch

    B, S, D, C = 3, 10, 8, 4
    q = rng.standard_normal((B, D)).astype(np.float32)
    s = rng.standard_normal((S, D)).astype(np.float32)
    sy = rng.integers(0, C, size=S).astype(np.int32)
    qy = rng.integers(0, C, size=B).astype(np.int32)

    probs, weights = nw_probs_and_weights(
        jnp.asarray(q), jnp.asarray(s), jnp.asarray(sy), C
    )
    got = np.asarray(
        support_influence(probs, jnp.asarray(qy), weights, jnp.asarray(sy))
    )

    # Torch loop oracle.
    t_probs = torch.from_numpy(np.array(probs))
    t_weights = torch.from_numpy(np.asarray(weights))
    for b in range(B):
        p = t_probs[b, qy[b]]
        ind = torch.from_numpy((sy == qy[b]).astype(np.float32))
        w = t_weights[b]
        want_b = torch.log((p - p * w) / (p - w * ind)).numpy()
        # fp32 near-cancellation (p - w) limits agreement to ~1e-4.
        np.testing.assert_allclose(got[b], want_b, rtol=1e-3, atol=2e-4)


def test_influence_sign_semantics(rng):
    """A support item of the query's class with high weight must have
    positive influence (helpful); wrong-class high-weight items negative."""
    C = 3
    q = np.zeros((1, 4), dtype=np.float32)
    s = np.stack([np.zeros(4), np.ones(4) * 3], axis=0).astype(np.float32)
    sy = np.array([0, 1], dtype=np.int32)
    probs, weights = nw_probs_and_weights(
        jnp.asarray(q), jnp.asarray(s), jnp.asarray(sy), C
    )
    infl = np.asarray(
        support_influence(probs, jnp.asarray([0]), weights, jnp.asarray(sy))
    )
    assert infl[0, 0] > 0  # same-class near neighbor helps
    assert infl[0, 1] < 0  # other-class hurts
