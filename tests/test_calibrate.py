"""Temperature scaling (ops/calibrate.py): the post-hoc calibration step
the reference's ECE metric (util/metric.py:75-112, vendored from
gpleiss/temperature_scaling) implies but never ships."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nwhead_tpu.ops.calibrate import apply_temperature, fit_temperature
from nwhead_tpu.ops.metrics import ece, nll_loss


def _overconfident_model(B=4096, C=20, t_true=2.5, seed=0):
    """Labels drawn from softmax(z); the 'model' reports softmax(z*t_true)
    — overconfident by exactly t_true, so the NLL-optimal temperature is
    ~t_true."""
    rng = np.random.default_rng(seed)
    z = rng.standard_normal((B, C)).astype(np.float32) * 2.0
    p = np.asarray(jax.nn.softmax(jnp.asarray(z), axis=-1))
    labels = np.array([rng.choice(C, p=row / row.sum()) for row in p])
    log_probs = np.asarray(jax.nn.log_softmax(jnp.asarray(z) * t_true))
    return jnp.asarray(log_probs), jnp.asarray(labels)


def test_temperature_one_is_noop():
    rng = np.random.default_rng(1)
    lp = jax.nn.log_softmax(jnp.asarray(rng.standard_normal((8, 10)), jnp.float32))
    np.testing.assert_allclose(
        np.asarray(apply_temperature(lp, 1.0)), np.asarray(lp), atol=1e-6
    )


def test_fit_recovers_known_temperature_and_improves_nll_ece():
    lp, y = _overconfident_model()
    T = float(fit_temperature(lp, y))
    assert 2.0 < T < 3.0, T  # ~t_true=2.5 up to sampling noise
    lp_cal = apply_temperature(lp, T)
    nll_raw = float(nll_loss(lp, y))
    nll_cal = float(nll_loss(lp_cal, y))
    assert nll_cal < nll_raw - 1e-3
    ece_raw = float(ece(jnp.exp(lp), y))
    ece_cal = float(ece(jnp.exp(lp_cal), y))
    assert ece_cal < ece_raw


def test_fit_matches_torch_lbfgs_oracle():
    """The gpleiss/temperature_scaling fitting recipe (LBFGS on NLL over a
    scalar temperature) must land on the same T as our golden-section
    search."""
    torch = pytest.importorskip("torch")
    lp, y = _overconfident_model(B=2048, C=12, t_true=1.8, seed=3)
    T_ours = float(fit_temperature(lp, y))

    logits = torch.tensor(np.asarray(lp))
    labels = torch.tensor(np.asarray(y), dtype=torch.long)
    log_t = torch.zeros(1, requires_grad=True)
    opt = torch.optim.LBFGS([log_t], lr=0.1, max_iter=100)
    nll = torch.nn.NLLLoss()

    def closure():
        opt.zero_grad()
        loss = nll(torch.log_softmax(logits / log_t.exp(), dim=-1), labels)
        loss.backward()
        return loss

    opt.step(closure)
    T_torch = float(log_t.exp().detach())
    assert abs(T_ours - T_torch) < 0.02 * T_torch, (T_ours, T_torch)


def test_well_calibrated_input_keeps_T_near_one():
    rng = np.random.default_rng(7)
    z = jnp.asarray(rng.standard_normal((4096, 10)), jnp.float32) * 2.0
    p = np.asarray(jax.nn.softmax(z, axis=-1))
    labels = jnp.asarray(
        [rng.choice(10, p=row / row.sum()) for row in p]
    )
    T = float(fit_temperature(jax.nn.log_softmax(z), labels))
    assert 0.9 < T < 1.1, T
