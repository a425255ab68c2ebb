"""Lab: where does the bf16 ViT-S/14 forward spend its 14 ms at B=64@224?

vit_s14 runs at ~14% MXU utilization under XLA (quant_lab --vit), which
bounds the reference's flagship dinov2 serving path. Decompose by timing
truncated forwards (prefix over depth) and isolated components (attention
core vs MLP vs LayerNorm chains) with the established barrier/differential
methodology (scripts/quant_lab.py docstring).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root (nwhead_tpu)
sys.path.insert(0, _HERE)  # sibling labs
from timing import interleaved_time  # noqa: E402


def main():
    from nwhead_tpu.models import load_model

    rng = np.random.default_rng(0)
    B, D, H, N = 64, 384, 6, 257
    hd = D // H

    x = jnp.asarray(
        rng.standard_normal((B, N, D)).astype(np.float32)
    ).astype(jnp.bfloat16)
    wqkv = jnp.asarray(
        (rng.standard_normal((D, 3 * D)) * 0.05).astype(np.float32)
    ).astype(jnp.bfloat16)
    wproj = jnp.asarray(
        (rng.standard_normal((D, D)) * 0.05).astype(np.float32)
    ).astype(jnp.bfloat16)
    wfc1 = jnp.asarray(
        (rng.standard_normal((D, 4 * D)) * 0.05).astype(np.float32)
    ).astype(jnp.bfloat16)
    wfc2 = jnp.asarray(
        (rng.standard_normal((4 * D, D)) * 0.05).astype(np.float32)
    ).astype(jnp.bfloat16)

    def qkv_matmul(xx, ww, carry):
        w_dep = jax.lax.optimization_barrier(ww + carry.astype(ww.dtype))
        out = jax.lax.optimization_barrier(xx @ w_dep)
        return jnp.sum(out[:1, :1, :1].astype(jnp.float32)) * 1e-20

    def attn_core(xx, ww, carry):
        w_dep = jax.lax.optimization_barrier(ww + carry.astype(ww.dtype))
        h = (xx @ w_dep).reshape(B, N, 3, H, hd)
        q, k, v = h[:, :, 0], h[:, :, 1], h[:, :, 2]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) / np.sqrt(hd)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(
            jnp.bfloat16
        )
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, D)
        out = jax.lax.optimization_barrier(out)
        return jnp.sum(out[:1, :1, :1].astype(jnp.float32)) * 1e-20

    def attn_core_bf16sm(xx, ww, carry):
        w_dep = jax.lax.optimization_barrier(ww + carry.astype(ww.dtype))
        h = (xx @ w_dep).reshape(B, N, 3, H, hd)
        q, k, v = h[:, :, 0], h[:, :, 1], h[:, :, 2]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) / np.sqrt(hd)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, D)
        out = jax.lax.optimization_barrier(out)
        return jnp.sum(out[:1, :1, :1].astype(jnp.float32)) * 1e-20

    def attn_merged_batch(xx, ww, carry):
        """(B*H) merged into one batch dim for the two attention einsums."""
        w_dep = jax.lax.optimization_barrier(ww + carry.astype(ww.dtype))
        h = (xx @ w_dep).reshape(B, N, 3, H, hd)
        q = h[:, :, 0].transpose(0, 2, 1, 3).reshape(B * H, N, hd)
        k = h[:, :, 1].transpose(0, 2, 1, 3).reshape(B * H, N, hd)
        v = h[:, :, 2].transpose(0, 2, 1, 3).reshape(B * H, N, hd)
        attn = jnp.einsum("znd,zmd->znm", q, k) / np.sqrt(hd)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(
            jnp.bfloat16
        )
        out = jnp.einsum("znm,zmd->znd", attn, v)
        out = out.reshape(B, H, N, hd).transpose(0, 2, 1, 3).reshape(B, N, D)
        out = jax.lax.optimization_barrier(out)
        return jnp.sum(out[:1, :1, :1].astype(jnp.float32)) * 1e-20

    def mlp(xx, ww1, ww2, carry):
        w_dep = jax.lax.optimization_barrier(ww1 + carry.astype(ww1.dtype))
        h = xx @ w_dep
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(
            jnp.bfloat16
        )
        out = jax.lax.optimization_barrier(h @ ww2)
        return jnp.sum(out[:1, :1, :1].astype(jnp.float32)) * 1e-20

    def ln(xx, carry):
        x_dep = jax.lax.optimization_barrier(
            xx + carry.astype(xx.dtype) * 0
        )
        xf = x_dep.astype(jnp.float32)
        mean = jnp.mean(xf, -1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), -1, keepdims=True)
        out = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
        out = jax.lax.optimization_barrier(out.astype(jnp.bfloat16))
        return jnp.sum(out[:1, :1, :1].astype(jnp.float32)) * 1e-20

    def attn_fused_kernel(xx, ww, carry):
        from nwhead_tpu.ops.pallas_attn import fused_attention

        w_dep = jax.lax.optimization_barrier(ww + carry.astype(ww.dtype))
        h = (xx @ w_dep).reshape(B, N, 3, H, hd)
        out = fused_attention(
            h[:, :, 0].transpose(0, 2, 1, 3),
            h[:, :, 1].transpose(0, 2, 1, 3),
            h[:, :, 2].transpose(0, 2, 1, 3),
        )
        out = out.transpose(0, 2, 1, 3).reshape(B, N, D)
        out = jax.lax.optimization_barrier(out)
        return jnp.sum(out[:1, :1, :1].astype(jnp.float32)) * 1e-20

    res = interleaved_time([
        ("qkv_matmul", qkv_matmul, (x, wqkv)),
        ("attn_core(f32 sm)", attn_core, (x, wqkv)),
        ("attn_core(bf16 sm)", attn_core_bf16sm, (x, wqkv)),
        ("attn_merged_batch", attn_merged_batch, (x, wqkv)),
        ("attn_fused_kernel", attn_fused_kernel, (x, wqkv)),
        ("mlp", mlp, (x, wfc1, wfc2)),
        ("layernorm", ln, (x,)),
    ])
    for name, t in res.items():
        print(f"  {name}: {t * 1e6:8.1f} us", flush=True)
    print(f"  (x12 blocks: attn_core + mlp + 2 ln = "
          f"{(res['attn_core(f32 sm)'] + res['mlp'] + 2 * res['layernorm']) * 12 * 1e3:.2f} ms)",
          flush=True)


if __name__ == "__main__":
    main()
