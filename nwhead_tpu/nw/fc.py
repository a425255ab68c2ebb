"""FC-head baseline network (``fchead/fc.py`` equivalent).

Backbone + Dense(n_classes) returning log-softmax, so the same NLL loss is
reusable across FC and NW training (``fc.py:17``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch ``nn.Linear`` default kernel init: kaiming_uniform(a=sqrt(5))
    == uniform(±1/sqrt(fan_in)) — 1/3 the variance of flax's lecun_normal.
    Matching the reference's init convention matters at short training
    budgets (smaller final-layer weights -> less overconfident logits)."""
    bound = 1.0 / jnp.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in):
    """torch ``nn.Linear`` default bias init: uniform(±1/sqrt(fan_in))."""
    bound = 1.0 / float(fan_in) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class FCHead(nn.Module):
    """Linear classifier head (``fc.py:19-25``), torch-Linear init
    conventions."""

    out_dim: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.out_dim,
            name="fc",
            kernel_init=torch_linear_kernel_init,
            bias_init=torch_linear_bias_init(x.shape[-1]),
        )(x)


class FCNet(nn.Module):
    """Featurizer + FC head -> log-softmax (``fc.py:5-17``)."""

    featurizer: nn.Module
    num_classes: int

    def setup(self):
        self.classifier = FCHead(out_dim=self.num_classes)

    def extract_feat(self, x, train: bool = False):
        return self.featurizer(x, train=train)

    def __call__(self, x, train: bool = True):
        features = self.featurizer(x, train=train)
        logits = self.classifier(features)
        return nn.log_softmax(logits, axis=-1)
