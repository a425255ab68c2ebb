"""Vision Transformer backbones (DINOv2-style), headless.

The reference offers ``--arch dinov2_vits14`` via ``torch.hub`` with
feat_dim 384 (``train.py:212-214``): a frozen/finetuned DINOv2 ViT-S/14
whose forward returns the normalized CLS token. This module provides the
equivalent architecture natively in Flax:

  * patch embedding (conv, stride = patch), CLS token, learned positional
    embeddings with bicubic interpolation for arbitrary input sizes;
  * pre-norm transformer blocks with LayerScale (DINOv2 uses init 1e-5);
  * output = final-LayerNorm CLS token (the classification feature).

Pretrained DINOv2 checkpoints import through
``torch_import.convert_vit_state_dict`` (this environment has no network
egress — pass a locally downloaded ``state_dict``).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class MlpBlock(nn.Module):
    hidden_dim: int
    out_dim: int
    dtype: Any = None
    # 'fused': Pallas fc1->gelu->fc2 (hidden activation never leaves VMEM —
    # XLA's chain round-trips it to HBM around the GELU). Differentiable
    # (custom VJP with cross-tile weight-grad accumulation).
    mlp_impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        fc1 = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")
        fc2 = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")
        if self.mlp_impl == "fused":
            from nwhead_tpu.ops.pallas_mlp import fused_mlp

            # One-token dummy call materializes the SAME param tree as the
            # xla branch; the fused kernel then consumes the raw weights.
            _ = fc2(nn.gelu(fc1(x[:1, :1]), approximate=False))
            p1 = fc1.variables["params"]
            p2 = fc2.variables["params"]
            return fused_mlp(x, p1["kernel"], p1["bias"],
                             p2["kernel"], p2["bias"])
        x = fc1(x)
        x = nn.gelu(x, approximate=False)
        return fc2(x)


class Attention(nn.Module):
    dim: int
    num_heads: int
    dtype: Any = None
    # 'xla' (default) or 'fused' (Pallas kernel, ops/pallas_attn.py: f32
    # softmax entirely in VMEM — the XLA chain's f32-softmax HBM round-trip
    # dominates encoder attention time, scripts/vit_lab.py). The fused
    # kernel has a custom VJP (recompute-in-backward), so it trains too.
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        B, N, D = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
        if self.attn_impl == "fused":
            from nwhead_tpu.ops.pallas_attn import fused_attention_qkv

            out = fused_attention_qkv(qkv, self.num_heads)
        else:
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, hd)
            attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) / np.sqrt(head_dim)
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
            if self.dtype is not None:
                attn = attn.astype(self.dtype)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, D)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    layerscale_init: Optional[float] = 1e-5  # DINOv2 LayerScale
    dtype: Any = None
    attn_impl: str = "xla"
    mlp_impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = Attention(self.dim, self.num_heads, dtype=self.dtype,
                      attn_impl=self.attn_impl, name="attn")(h)
        if self.layerscale_init is not None:
            gamma1 = self.param(
                "ls1_gamma", nn.initializers.constant(self.layerscale_init), (self.dim,)
            )
            h = h * gamma1
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        h = MlpBlock(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype,
                     mlp_impl=self.mlp_impl, name="mlp")(h)
        if self.layerscale_init is not None:
            gamma2 = self.param(
                "ls2_gamma", nn.initializers.constant(self.layerscale_init), (self.dim,)
            )
            h = h * gamma2
        return x + h


def _interpolate_pos_embed(pos: jnp.ndarray, n_patches: int, h: int, w: int):
    """Bicubic-resample patch position embeddings to an (h, w) grid
    (DINOv2's interpolate_pos_encoding)."""
    n_orig = pos.shape[1]
    if n_orig == n_patches:
        return pos
    g_orig = int(np.sqrt(n_orig))
    dim = pos.shape[-1]
    grid = pos.reshape(1, g_orig, g_orig, dim)
    grid = jax.image.resize(grid, (1, h, w, dim), method="bicubic")
    return grid.reshape(1, h * w, dim)


class VisionTransformer(nn.Module):
    """Headless ViT: returns the final-norm CLS token (B, embed_dim)."""

    patch_size: int = 14
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    layerscale_init: Optional[float] = 1e-5
    img_size: int = 518  # grid the stored pos-embed corresponds to (DINOv2)
    dtype: Any = None
    # 'fused' Pallas kernels for attention and the MLP; both carry custom
    # VJPs (recompute-in-backward), so they are safe for finetuning too.
    attn_impl: str = "xla"
    mlp_impl: str = "xla"
    # Local DINOv2-format checkpoint; merged at init (the reference always
    # hub-loads pretrained dinov2 weights, train.py:212-214).
    pretrained_path: Any = None

    @property
    def feat_dim(self) -> int:
        return self.embed_dim

    @nn.compact
    def __call__(self, x, train: bool = True):
        del train  # no BN; dropout not used at inference parity
        if self.dtype is not None:
            x = x.astype(self.dtype)
        B, H, W, _ = x.shape
        gh, gw = H // self.patch_size, W // self.patch_size
        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        x = x.reshape(B, gh * gw, self.embed_dim)

        cls = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02), (1, 1, self.embed_dim)
        )
        n_pos = (self.img_size // self.patch_size) ** 2
        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, n_pos + 1, self.embed_dim),
        )
        cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
        patch_pos = _interpolate_pos_embed(patch_pos, gh * gw, gh, gw)

        x = x + patch_pos.astype(x.dtype)
        cls_tok = (cls + cls_pos).astype(x.dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls_tok, (B, 1, self.embed_dim)), x], axis=1)

        for i in range(self.depth):
            x = Block(
                self.embed_dim,
                self.num_heads,
                self.mlp_ratio,
                self.layerscale_init,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                mlp_impl=self.mlp_impl,
                name=f"block{i}",
            )(x)

        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        return x[:, 0].astype(jnp.float32)  # CLS token


def vit_s14(**kw) -> VisionTransformer:
    """DINOv2 ViT-S/14 architecture (feat_dim 384, ``train.py:212-214``)."""
    return VisionTransformer(patch_size=14, embed_dim=384, depth=12, num_heads=6, **kw)


def vit_b14(**kw) -> VisionTransformer:
    return VisionTransformer(patch_size=14, embed_dim=768, depth=12, num_heads=12, **kw)


def vit_l14(**kw) -> VisionTransformer:
    return VisionTransformer(patch_size=14, embed_dim=1024, depth=24, num_heads=16, **kw)


def vit_s16(**kw) -> VisionTransformer:
    return VisionTransformer(patch_size=16, embed_dim=384, depth=12, num_heads=6, img_size=224, **kw)
