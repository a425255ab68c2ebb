"""NW head as a Flax module (kernel params live in the param tree).

The head itself is the pure op from ``nwhead_tpu.ops.nw``; this module exists
so the ``clip`` kernel's learnable ``logit_scale`` (reference
``kernel.py:35-44``) is trained jointly with the backbone, and to give the
network layer a single dispatch point between the naive op and the fused
Pallas kernel.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from nwhead_tpu.ops import nw as nw_ops


class NWHead(nn.Module):
    """Equivalent of the reference ``NWHead`` module (``nw.py:256-289``)."""

    n_classes: int
    kernel_type: str = "euclidean"
    use_fused: bool = True  # dispatch to the Pallas kernel for large supports
    fused_min_support: int = 1024
    # 'f32' (exact), 'bf16' (cast features before the distance computation —
    # half the bank traffic, single-pass MXU dots; training-quality parity
    # validated in tests/test_bf16_training.py), 'int8' or 'int4' (per-row
    # quantized SERVING banks only: applies to the prepared full-mode path
    # built by NWNet.precompute; episodic training stays f32. int4 packs
    # two codes per byte — 8x less bank DMA than f32, 2x the rows per chip
    # vs int8).
    precision: str = "f32"

    def setup(self):
        # Defined in setup (not inline in a @compact __call__) so every
        # entry point — __call__, from_prepared, probs_and_weights, scores —
        # can read the clip kernel's learnable scale.
        if self.kernel_type == "clip":
            self.logit_scale = self.param(
                "logit_scale",
                lambda key: jnp.asarray(math.log(1.0 / 0.07), jnp.float32),
            )

    def _kernel_params(self):
        if self.kernel_type == "clip":
            return {"logit_scale": self.logit_scale}
        return {}

    def __call__(
        self,
        qfeat: jnp.ndarray,
        sfeat: jnp.ndarray,
        sy: jnp.ndarray,
        support_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """log(probs + 1e-12), shape (B, n_classes)."""
        kparams = self._kernel_params()
        s_len = sfeat.shape[-2]
        if (
            self.use_fused
            and s_len >= self.fused_min_support
            and sfeat.ndim == 2
            and qfeat.ndim == 2
            and self.kernel_type in ("euclidean", "hypersphere_euclidean", "cosine", "dotproduct", "clip")
        ):
            from nwhead_tpu.ops.pallas_nw import nw_fused_log_probs

            return nw_fused_log_probs(
                qfeat,
                sfeat,
                sy,
                self.n_classes,
                kernel=self.kernel_type,
                kernel_params=kparams,
                support_mask=support_mask,
                precision=self.precision,
            )
        if self.precision == "bf16":  # bf16-bank semantics on the naive path
            qfeat = qfeat.astype(jnp.bfloat16).astype(jnp.float32)
            sfeat = sfeat.astype(jnp.bfloat16).astype(jnp.float32)
        return nw_ops.nw_log_probs(
            qfeat,
            sfeat,
            sy,
            self.n_classes,
            kernel=self.kernel_type,
            kernel_params=kparams,
            support_mask=support_mask,
        )

    def from_prepared(self, qfeat, prepared):
        """Serving fast path: fused head over a ``prepare_support`` bank
        (zero per-call bank preparation). Inference-only."""
        from nwhead_tpu.ops.pallas_nw import nw_fused_from_prepared

        return nw_fused_from_prepared(
            qfeat,
            prepared,
            self.n_classes,
            kernel=self.kernel_type,
            kernel_params=self._kernel_params(),
        )

    def probs_and_weights(self, qfeat, sfeat, sy, support_mask=None):
        """(probs, softmax weights) for influence computation."""
        kparams = self._kernel_params()
        return nw_ops.nw_probs_and_weights(
            qfeat,
            sfeat,
            sy,
            self.n_classes,
            kernel=self.kernel_type,
            kernel_params=kparams,
            support_mask=support_mask,
        )

    def scores(self, qfeat, sfeat, support_mask=None):
        kparams = self._kernel_params()
        return nw_ops.nw_scores(
            qfeat,
            sfeat,
            kernel=self.kernel_type,
            kernel_params=kparams,
            support_mask=support_mask,
        )
