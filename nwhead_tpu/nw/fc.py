"""FC-head baseline network (``fchead/fc.py`` equivalent).

Backbone + Dense(n_classes) returning log-softmax, so the same NLL loss is
reusable across FC and NW training (``fc.py:17``).
"""

from __future__ import annotations

import flax.linen as nn


class FCHead(nn.Module):
    """Linear classifier head (``fc.py:19-25``)."""

    out_dim: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.out_dim, name="fc")(x)


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
