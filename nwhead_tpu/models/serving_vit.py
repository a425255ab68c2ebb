"""Float (bf16) fused-serving ViT graph: the no-quantization sibling of
``QuantizedViT``.

Built from trained flax variables with ZERO calibration (it is the same
math as ``VisionTransformer.__call__(train=False)`` with ``dtype=bf16``),
but every block half runs as ONE Pallas kernel — LayerNorm, the two
matmuls, the f32 softmax / exact GELU, LayerScale, and the residual add
all in VMEM (``ops/pallas_attn.py::fused_attention_block_bf16``,
``ops/pallas_mlp.py::fused_mlp_block_bf16``). Compared to the flax
``attn_impl='fused', mlp_impl='fused'`` path (which keeps LN/LayerScale/
residual in XLA because the training graph must stay differentiable),
this removes four (B, N, D) HBM round trips per block.

Serving-only. For finetuning use the flax model with the differentiable
fused kernels. Reference anchor: the dinov2 flagship arch,
``/root/reference/train.py:212-214``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nwhead_tpu.models.quantize import QLayerNorm


class ServingViTBlock(NamedTuple):
    norm1: QLayerNorm
    w_qkv: jnp.ndarray   # (D, 3D) bf16
    b_qkv: jnp.ndarray   # (3D,) f32
    w_proj: jnp.ndarray  # (D, D) bf16
    b_proj: jnp.ndarray  # (D,) f32
    ls1: Optional[jnp.ndarray]
    norm2: QLayerNorm
    w_fc1: jnp.ndarray   # (D, 4D) bf16
    b_fc1: jnp.ndarray
    w_fc2: jnp.ndarray   # (4D, D) bf16
    b_fc2: jnp.ndarray
    ls2: Optional[jnp.ndarray]


def _svit_forward(statics, tree, x):
    """Pure bf16 fused-serving forward; weights ride in ``tree`` as jit
    ARGUMENTS (closure constants trip the remote-compile body cap at
    ViT-B scale — models/quantize.py has the full story)."""
    from nwhead_tpu.models.vit import _interpolate_pos_embed
    from nwhead_tpu.ops.pallas_attn import (
        _bf16_attn_k_chunk,
        fused_attention_block_bf16,
        fused_attention_qkv,
    )
    from nwhead_tpu.ops.pallas_mlp import fused_mlp_block_bf16

    patch_size, num_heads = statics
    patch_w, patch_b, cls_token, pos_embed, blocks, final_norm = tree

    B, H, W, _ = x.shape
    gh, gw = H // patch_size, W // patch_size
    D = patch_w.shape[-1]
    x = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), patch_w,
        (patch_size, patch_size), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + patch_b.astype(jnp.bfloat16)
    x = x.reshape(B, gh * gw, D)

    cls_pos, patch_pos = pos_embed[:, :1], pos_embed[:, 1:]
    patch_pos = _interpolate_pos_embed(patch_pos, gh * gw, gh, gw)
    x = x + patch_pos.astype(x.dtype)
    cls_tok = (cls_token + cls_pos).astype(x.dtype)
    x = jnp.concatenate(
        [jnp.broadcast_to(cls_tok, (B, 1, D)), x], axis=1
    )

    head_dim = D // num_heads
    N = x.shape[1]
    try:
        _bf16_attn_k_chunk(N, D)
        fused_attn_ok = True
    except ValueError:
        fused_attn_ok = False
    for blk in blocks:
        if fused_attn_ok:
            x = fused_attention_block_bf16(
                x, blk.w_qkv, blk.b_qkv, blk.w_proj, blk.b_proj, num_heads,
                ln_scale=blk.norm1.scale, ln_bias=blk.norm1.bias,
                layerscale=blk.ls1, residual=True,
            )
        else:
            h = blk.norm1(x)
            h = (h @ blk.w_qkv.astype(h.dtype)
                 + blk.b_qkv.astype(h.dtype))
            h = h.reshape(B, N, 3, num_heads, head_dim)
            out = fused_attention_qkv(h, num_heads)
            out = out @ blk.w_proj.astype(out.dtype) + blk.b_proj.astype(
                out.dtype)
            if blk.ls1 is not None:
                out = out * blk.ls1.astype(out.dtype)
            x = x + out
        x = fused_mlp_block_bf16(
            x, blk.w_fc1, blk.b_fc1, blk.w_fc2, blk.b_fc2,
            ln_scale=blk.norm2.scale, ln_bias=blk.norm2.bias,
            layerscale=blk.ls2, residual=True,
        )

    x = final_norm(x)
    return x[:, 0].astype(jnp.float32)


_svit_forward_jit = jax.jit(_svit_forward, static_argnums=(0,))


class ServingViT(NamedTuple):
    patch_w: jnp.ndarray
    patch_b: jnp.ndarray
    cls_token: jnp.ndarray
    pos_embed: jnp.ndarray
    patch_size: int
    num_heads: int
    blocks: Tuple[ServingViTBlock, ...]
    final_norm: QLayerNorm

    def split(self):
        statics = (self.patch_size, self.num_heads)
        tree = (self.patch_w, self.patch_b, self.cls_token, self.pos_embed,
                self.blocks, self.final_norm)
        return statics, tree

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        statics, tree = self.split()
        return _svit_forward_jit(statics, tree, x)

    @staticmethod
    def unjitted_forward():
        """The raw forward for callers composing a LARGER jit (e.g.
        ``NWNet.make_serving_fn``): call as ``fwd(statics, tree, x)`` with
        the tree as an argument of the outer jit, never a closure."""
        return _svit_forward


def fuse_vit_serving(model, variables) -> ServingViT:
    """Freeze trained ViT variables into the bf16 fused-serving graph.
    No calibration — same math as the flax bf16 eval forward, kernels
    swapped. ``model``: the ``VisionTransformer``; ``variables``: its
    trained ``{'params': ...}``."""
    params = variables["params"]

    def ln(p):
        return QLayerNorm(
            scale=jnp.asarray(p["scale"], jnp.float32),
            bias=jnp.asarray(p["bias"], jnp.float32),
        )

    def bf16(p):
        return jnp.asarray(p, jnp.bfloat16)

    blocks = []
    for i in range(model.depth):
        bp = params[f"block{i}"]
        blocks.append(ServingViTBlock(
            norm1=ln(bp["norm1"]),
            w_qkv=bf16(bp["attn"]["qkv"]["kernel"]),
            b_qkv=jnp.asarray(bp["attn"]["qkv"]["bias"], jnp.float32),
            w_proj=bf16(bp["attn"]["proj"]["kernel"]),
            b_proj=jnp.asarray(bp["attn"]["proj"]["bias"], jnp.float32),
            ls1=(jnp.asarray(bp["ls1_gamma"], jnp.float32)
                 if "ls1_gamma" in bp else None),
            norm2=ln(bp["norm2"]),
            w_fc1=bf16(bp["mlp"]["fc1"]["kernel"]),
            b_fc1=jnp.asarray(bp["mlp"]["fc1"]["bias"], jnp.float32),
            w_fc2=bf16(bp["mlp"]["fc2"]["kernel"]),
            b_fc2=jnp.asarray(bp["mlp"]["fc2"]["bias"], jnp.float32),
            ls2=(jnp.asarray(bp["ls2_gamma"], jnp.float32)
                 if "ls2_gamma" in bp else None),
        ))
    return ServingViT(
        patch_w=bf16(params["patch_embed"]["kernel"]),
        patch_b=jnp.asarray(params["patch_embed"]["bias"], jnp.float32),
        cls_token=jnp.asarray(params["cls_token"], jnp.float32),
        pos_embed=jnp.asarray(params["pos_embed"], jnp.float32),
        patch_size=model.patch_size,
        num_heads=model.num_heads,
        blocks=tuple(blocks),
        final_norm=ln(params["norm"]),
    )
