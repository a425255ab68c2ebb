"""Utility coverage: summary, linear_normalization, profiler trace, lazy
package exports."""

import numpy as np
import pytest


def test_summary_counts_params(capsys):
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from nwhead_tpu.utils import summary

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(4)(x)

    m = M()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)))
    total = summary(m, v)
    assert total == 3 * 4 + 4
    out = capsys.readouterr().out
    assert "Total parameters: 16" in out


def test_linear_normalization():
    from nwhead_tpu.utils import linear_normalization

    rng = np.random.default_rng(0)
    arr = rng.normal(0, 5, size=(2, 4, 4, 3)).astype(np.float32)
    out = linear_normalization(arr)
    assert out.shape == arr.shape
    assert out.min() >= -1e-5 and out.max() <= 1 + 1e-5
    # all-zero image doesn't divide by zero
    z = np.zeros((1, 4, 4, 3), np.float32)
    assert np.isfinite(linear_normalization(z)).all()


def test_profiler_trace_smoke(tmp_path):
    import jax.numpy as jnp

    from nwhead_tpu.utils.profiling import annotate, trace

    with trace(str(tmp_path)):
        with annotate("phase"):
            jnp.ones((8, 8)).sum().block_until_ready()
    import os

    assert os.listdir(tmp_path)  # trace files were written


def test_lazy_top_level_exports():
    import nwhead_tpu

    assert nwhead_tpu.NWNet.__name__ == "NWNet"
    assert nwhead_tpu.FCNet.__name__ == "FCNet"
    assert callable(nwhead_tpu.load_model)
    assert callable(nwhead_tpu.nw_fused_log_probs)
    with pytest.raises(AttributeError):
        nwhead_tpu.nope
