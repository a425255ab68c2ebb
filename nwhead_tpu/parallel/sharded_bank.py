"""Support-sharded NW inference: the framework's distributed backend.

The NW op's scaling axis is the support size S (the sequence-length analog,
SURVEY.md §2.5). Full-mode inference with a pod-scale bank shards the
support features over the ``support`` mesh axis; each device computes
online-softmax partial statistics (running max m, normalizer l, weighted
label-sum acc) over its local shard, and one tiny collective combines them:

    m* = pmax(m)                     -- (B, 1) per query
    l* = psum(l · exp(m - m*))       -- renormalized normalizers
    acc* = psum(acc · exp(m - m*))   -- renormalized label sums
    probs = acc* / l*

This is mathematically exact (softmax-weighted label averaging is
associative under online-softmax renormalization) — the collective payload
is (B, C+2) per device regardless of S, so S scales with pod HBM while ICI
traffic stays constant. The reference has no distributed path at all
(single GPU, ``train.py:128-133``); its closest ancestor is the host-side
streaming loop ``legacy/model/net.py:53-72``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nwhead_tpu.ops.nw import LOG_FLOOR
from nwhead_tpu.ops.kernels import get_kernel

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def nw_partials(
    qfeat: jnp.ndarray,
    sfeat: jnp.ndarray,
    sy: jnp.ndarray,
    mask: jnp.ndarray,
    n_classes: int,
    *,
    kernel: str = "euclidean",
    kernel_params: Optional[Dict[str, Any]] = None,
    use_fused: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-shard online-softmax partials for a local support shard.

    qfeat: (B, D); sfeat: (S_loc, D); sy: (S_loc,) int; mask: (S_loc,).
    Returns (m (B, 1), l (B, 1), acc (B, C)).

    use_fused: run the fused Pallas kernel per shard (default on TPU; the
    materialized jnp path elsewhere — both are exact).
    """
    if use_fused is None:
        use_fused = jax.default_backend() == "tpu"
    if use_fused:
        from nwhead_tpu.ops.pallas_nw import nw_fused_partials

        return nw_fused_partials(
            qfeat, sfeat, sy, n_classes,
            kernel=kernel, kernel_params=kernel_params, support_mask=mask,
        )
    kernel_fn, init_params = get_kernel(kernel)
    kparams = kernel_params if kernel_params is not None else init_params
    scores = kernel_fn(kparams, qfeat[:, None, :], sfeat[None])[  # (B, 1, S)
        :, 0, :
    ]
    scores = jnp.where(mask[None, :] > 0, scores, _NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)  # (B, 1)
    m_safe = jnp.where(m > _NEG_INF / 2, m, 0.0)
    p = jnp.where(scores > _NEG_INF / 2, jnp.exp(scores - m_safe), 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    onehot = jax.nn.one_hot(sy, n_classes, dtype=jnp.float32)
    acc = p @ onehot  # (B, C)
    return m, l, acc


def merge_partials(m, l, acc, axis_name: str):
    """Combine per-shard partials across the support axis (exact)."""
    m_g = jax.lax.pmax(m, axis_name)
    scale = jnp.where(m > _NEG_INF / 2, jnp.exp(m - m_g), 0.0)
    l_g = jax.lax.psum(l * scale, axis_name)
    acc_g = jax.lax.psum(acc * scale, axis_name)
    probs = acc_g / jnp.maximum(l_g, 1e-30)
    return jnp.log(probs + LOG_FLOOR)


@dataclass
class ShardedSupportBank:
    """HBM-resident support bank, rows sharded over the 'support' mesh axis.

    Built once per precompute; padded to a multiple of the shard count with
    masked rows (score -inf == absent).
    """

    feat: jnp.ndarray  # (S_pad, D), sharded P('support')
    labels: jnp.ndarray  # (S_pad,), sharded P('support')
    mask: jnp.ndarray  # (S_pad,), sharded P('support')
    mesh: Mesh
    n_classes: int
    kernel: str = "euclidean"

    @staticmethod
    def build(
        feats: np.ndarray,
        labels: np.ndarray,
        mesh: Mesh,
        n_classes: int,
        kernel: str = "euclidean",
    ) -> "ShardedSupportBank":
        from nwhead_tpu.ops.pallas_nw import _auto_block_s, _round_up

        n_shards = mesh.shape["support"]
        S, D = feats.shape
        # Pad so each LOCAL shard is already a multiple of the fused
        # kernel's tile size — the per-shard jnp.pad inside the shard_mapped
        # predict is then a no-op instead of a shard-bytes copy per call.
        local = -(-S // n_shards)
        block = _auto_block_s(local, D, 4, _round_up(n_classes, 128))
        s_pad = _round_up(local, block) * n_shards
        feat = np.zeros((s_pad, D), np.float32)
        feat[:S] = feats
        lab = np.zeros((s_pad,), np.int32)
        lab[:S] = labels
        mask = np.zeros((s_pad,), np.float32)
        mask[:S] = 1.0
        shard = NamedSharding(mesh, P("support"))
        return ShardedSupportBank(
            feat=jax.device_put(jnp.asarray(feat), shard),
            labels=jax.device_put(jnp.asarray(lab), shard),
            mask=jax.device_put(jnp.asarray(mask), shard),
            mesh=mesh,
            n_classes=n_classes,
            kernel=kernel,
        )

    def predict_fn(self, kernel_params: Optional[Dict[str, Any]] = None):
        """Jitted, shard_mapped full-mode predict: qfeat (B, D) -> (B, C)
        log-probs. Queries are sharded over 'data' and replicated over
        'support'; the bank stays put; one (B, C+2) psum rides ICI."""
        n_classes = self.n_classes
        kernel = self.kernel

        def local(qfeat, sfeat, sy, mask):
            m, l, acc = nw_partials(
                qfeat, sfeat, sy, mask, n_classes,
                kernel=kernel, kernel_params=kernel_params,
            )
            return merge_partials(m, l, acc, "support")

        mapped = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P("data"), P("support"), P("support"), P("support")),
            out_specs=P("data"),
        )

        @jax.jit
        def predict(qfeat):
            return mapped(qfeat, self.feat, self.labels, self.mask)

        return predict
