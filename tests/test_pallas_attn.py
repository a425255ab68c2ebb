"""Fused attention kernel (ops/pallas_attn.py) vs the naive XLA chain."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nwhead_tpu.ops.pallas_attn import fused_attention


def _naive(q, k, v, scale):
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", attn, v)


@pytest.mark.parametrize("N,hd", [(257, 64), (128, 128), (100, 32)])
def test_fused_attention_matches_naive_f32(rng, N, hd):
    B, H = 2, 3
    q = jnp.asarray(rng.standard_normal((B, H, N, hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, N, hd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, N, hd)).astype(np.float32))
    scale = 1.0 / hd ** 0.5
    got = np.asarray(fused_attention(q, k, v, scale=scale))
    want = np.asarray(_naive(q, k, v, scale))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_fused_attention_bf16(rng):
    B, H, N, hd = 2, 2, 130, 64
    mk = lambda: jnp.asarray(
        rng.standard_normal((B, H, N, hd)).astype(np.float32)
    ).astype(jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    got = np.asarray(fused_attention(q, k, v).astype(jnp.float32))
    want = np.asarray(
        _naive(q, k, v, 1.0 / hd ** 0.5).astype(jnp.float32)
    )
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)


def test_fused_qkv_matches_naive(rng):
    from nwhead_tpu.ops.pallas_attn import fused_attention_qkv

    B, N, H, hd = 2, 37, 3, 16
    qkv = jnp.asarray(rng.standard_normal((B, N, 3, H, hd)).astype(np.float32))
    got = np.asarray(fused_attention_qkv(qkv, H))
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    want = np.asarray(
        _naive(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), 1.0 / hd ** 0.5,
        ).transpose(0, 2, 1, 3).reshape(B, N, H * hd)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_fused_qkv_gradients_match_xla(rng):
    """The custom VJP (recompute-in-backward Pallas kernel) must produce
    the same qkv gradients as autodiff through the XLA chain."""
    from nwhead_tpu.ops.pallas_attn import fused_attention_qkv

    B, N, H, hd = 2, 29, 2, 16
    qkv = jnp.asarray(rng.standard_normal((B, N, 3, H, hd)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((H * hd,)).astype(np.float32))

    def loss_fused(qkv_):
        out = fused_attention_qkv(qkv_, H)
        return jnp.sum(jnp.tanh(out) * w)

    def loss_xla(qkv_):
        q, k, v = qkv_[:, :, 0], qkv_[:, :, 1], qkv_[:, :, 2]
        out = _naive(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), 1.0 / hd ** 0.5,
        ).transpose(0, 2, 1, 3).reshape(B, N, H * hd)
        return jnp.sum(jnp.tanh(out) * w)

    g_fused = np.asarray(jax.grad(loss_fused)(qkv))
    g_xla = np.asarray(jax.grad(loss_xla)(qkv))
    np.testing.assert_allclose(g_fused, g_xla, rtol=2e-3, atol=2e-5)


def test_vit_fused_attention_trains(rng):
    """End to end: gradients flow through a fused-attention ViT block
    (attn_impl='fused' is finetunable)."""
    from nwhead_tpu.models import load_model

    m = load_model("vit_s16", attn_impl="fused")
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, train=False)

    def loss(params):
        f = m.apply({"params": params}, x, train=True)
        return jnp.sum(f * f)

    g = jax.grad(loss)(v["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(t)).all() for t in leaves)
    # Attention params receive non-zero gradient.
    gq = np.asarray(g["block0"]["attn"]["qkv"]["kernel"])
    assert np.abs(gq).max() > 0


def test_flash_tiled_path_matches_single_pass(rng, monkeypatch):
    """The k-chunked online-softmax (long-sequence) path must equal the
    single-pass kernel exactly (forced by shrinking the VMEM budget)."""
    import nwhead_tpu.ops.pallas_attn as pa

    B, N, H, hd = 2, 300, 2, 16
    qkv = jnp.asarray(rng.standard_normal((B, N, 3, H, hd)).astype(np.float32))
    want = np.asarray(pa.fused_attention_qkv(qkv, H))

    monkeypatch.setattr(pa, "_VMEM_LIMIT", 1 * 1024 * 1024)
    monkeypatch.setattr(pa, "_FLASH_CHUNK", 64)
    assert pa._select_k_chunk(N, H * hd, 4) == 64  # chunked path selected
    got = np.asarray(pa.fused_attention_qkv(qkv, H))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_flash_tiled_gradients_match_xla(rng, monkeypatch):
    """The chunked backward (two-sweep flash recompute) must produce the
    same qkv gradients as autodiff through the XLA chain — training at
    long N is supported, not silently forward-only."""
    import nwhead_tpu.ops.pallas_attn as pa

    B, N, H, hd = 2, 200, 2, 16
    qkv = jnp.asarray(rng.standard_normal((B, N, 3, H, hd)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((H * hd,)).astype(np.float32))

    def loss_fused(qkv_):
        return jnp.sum(jnp.tanh(pa.fused_attention_qkv(qkv_, H)) * w)

    def loss_xla(qkv_):
        q, k, v = qkv_[:, :, 0], qkv_[:, :, 1], qkv_[:, :, 2]
        out = _naive(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), 1.0 / hd ** 0.5,
        ).transpose(0, 2, 1, 3).reshape(B, N, H * hd)
        return jnp.sum(jnp.tanh(out) * w)

    monkeypatch.setattr(pa, "_VMEM_LIMIT", 512 * 1024)
    monkeypatch.setattr(pa, "_FLASH_CHUNK", 64)
    assert pa._select_k_chunk(N, H * hd, 4) == 64  # chunked path selected
    g_fused = np.asarray(jax.grad(loss_fused)(qkv))
    g_xla = np.asarray(jax.grad(loss_xla)(qkv))
    np.testing.assert_allclose(g_fused, g_xla, rtol=2e-3, atol=2e-5)


def test_custom_scale_forward_and_grad(rng):
    """A non-default scale is first-class: forward matches the naive chain
    and the VJP differentiates (no forward-only configurations remain)."""
    from nwhead_tpu.ops.pallas_attn import fused_attention_qkv

    B, N, H, hd = 1, 33, 2, 16
    qkv = jnp.asarray(rng.standard_normal((B, N, 3, H, hd)).astype(np.float32))
    scale = 0.31
    got = np.asarray(fused_attention_qkv(qkv, H, scale=scale))
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    want = np.asarray(
        _naive(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), scale,
        ).transpose(0, 2, 1, 3).reshape(B, N, H * hd)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def loss_fused(qkv_):
        return jnp.sum(fused_attention_qkv(qkv_, H, scale=scale) ** 2)

    def loss_xla(qkv_):
        q_, k_, v_ = qkv_[:, :, 0], qkv_[:, :, 1], qkv_[:, :, 2]
        out = _naive(
            q_.transpose(0, 2, 1, 3), k_.transpose(0, 2, 1, 3),
            v_.transpose(0, 2, 1, 3), scale,
        ).transpose(0, 2, 1, 3).reshape(B, N, H * hd)
        return jnp.sum(out ** 2)

    g_fused = np.asarray(jax.grad(loss_fused)(qkv))
    g_xla = np.asarray(jax.grad(loss_xla)(qkv))
    np.testing.assert_allclose(g_fused, g_xla, rtol=2e-3, atol=2e-5)


def test_flash_tiled_raises_when_nothing_fits(monkeypatch):
    import nwhead_tpu.ops.pallas_attn as pa

    monkeypatch.setattr(pa, "_VMEM_LIMIT", 1024)
    with pytest.raises(ValueError, match="shard the sequence"):
        pa._select_k_chunk(4096, 384, 4)


def test_fused_qkv_randomized_property_sweep(monkeypatch):
    """Seeded randomized sweep over fused_attention_qkv's configuration
    space — B/N/H/hd x custom-vs-default scale x single-pass-vs-forced-
    flash-tiled — each sample vs the XLA chain, plus spot grad checks.
    Complements the hand-picked cases with shape interactions they can't
    enumerate (the NW-kernel twin of this sweep caught a real sub-lane
    block_s bug on its first run)."""
    import nwhead_tpu.ops.pallas_attn as pa

    sweep_rng = np.random.default_rng(2027)
    for trial in range(8):
        B = int(sweep_rng.integers(1, 4))
        N = int(sweep_rng.integers(5, 300))
        H = int(sweep_rng.integers(1, 5))
        hd = int(sweep_rng.choice([8, 16, 32, 64]))
        custom_scale = bool(sweep_rng.integers(2))
        force_flash = bool(sweep_rng.integers(2))
        scale = 0.31 if custom_scale else 1.0 / hd ** 0.5
        qkv = jnp.asarray(
            sweep_rng.standard_normal((B, N, 3, H, hd)).astype(np.float32)
        )
        ctx = (f"trial={trial} B={B} N={N} H={H} hd={hd} "
               f"scale={'custom' if custom_scale else 'default'} "
               f"flash={force_flash}")
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        want = np.asarray(
            _naive(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), scale,
            ).transpose(0, 2, 1, 3).reshape(B, N, H * hd)
        )
        with monkeypatch.context() as mp:
            if force_flash:
                mp.setattr(pa, "_VMEM_LIMIT", 512 * 1024)
                mp.setattr(pa, "_FLASH_CHUNK", 64)
            kw = {"scale": scale} if custom_scale else {}
            got = np.asarray(pa.fused_attention_qkv(qkv, H, **kw))
            np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5,
                                       err_msg=ctx)
            if trial % 4 == 0:  # spot-check gradients on a subset
                w = jnp.asarray(
                    sweep_rng.standard_normal((H * hd,)).astype(np.float32)
                )

                def loss_fused(qkv_):
                    out = pa.fused_attention_qkv(qkv_, H, **kw)
                    return jnp.sum(jnp.tanh(out) * w)

                def loss_xla(qkv_):
                    q_, k_, v_ = qkv_[:, :, 0], qkv_[:, :, 1], qkv_[:, :, 2]
                    out = _naive(
                        q_.transpose(0, 2, 1, 3), k_.transpose(0, 2, 1, 3),
                        v_.transpose(0, 2, 1, 3), scale,
                    ).transpose(0, 2, 1, 3).reshape(B, N, H * hd)
                    return jnp.sum(jnp.tanh(out) * w)

                g_fused = np.asarray(jax.grad(loss_fused)(qkv))
                g_xla = np.asarray(jax.grad(loss_xla)(qkv))
                np.testing.assert_allclose(g_fused, g_xla, rtol=2e-3,
                                           atol=2e-4, err_msg="grad " + ctx)


def test_fused_int8_attention_matches_composition(rng):
    """The one-kernel int8 attention sublayer must match the unfused
    QDense(qkv) -> fused_attention_qkv -> QDense(proj) composition it
    replaces (same math, same quantization points)."""
    from nwhead_tpu.models.quantize import QDense
    from nwhead_tpu.ops.pallas_attn import (
        fused_attention_qkv, fused_attention_qkv_int8, int8_attention_fits)

    B, N, H, hd = 2, 57, 3, 16
    D = H * hd
    assert int8_attention_fits(N, D)
    x = jnp.asarray(
        rng.standard_normal((B, N, D)).astype(np.float32)
    ).astype(jnp.bfloat16)

    def mk_qdense(din, dout):
        w = rng.standard_normal((din, dout)).astype(np.float32) * 0.1
        s = np.abs(w).max(0) / 127.0
        wq = np.clip(np.round(w / s), -127, 127).astype(np.int8)
        b = rng.standard_normal((dout,)).astype(np.float32) * 0.01
        return QDense(jnp.asarray(wq), jnp.asarray(s), jnp.asarray(b),
                      jnp.float32(0.05))

    qkv_d = mk_qdense(D, 3 * D)
    proj_d = mk_qdense(D, D)

    got = np.asarray(
        fused_attention_qkv_int8(
            x, qkv_d.wq, qkv_d.w_scale, qkv_d.bias, qkv_d.act_scale,
            proj_d.wq, proj_d.w_scale, proj_d.bias, proj_d.act_scale, H,
        ).astype(jnp.float32)
    )
    h = qkv_d(x).reshape(B, N, 3, H, hd)
    want = np.asarray(proj_d(fused_attention_qkv(h, H)).astype(jnp.float32))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_fused_int8_attention_randomized_shape_sweep():
    """Seeded sweep of the one-kernel int8 attention sublayer vs its
    QDense->fused_attention_qkv->QDense composition across random
    (B, N, H, hd) accepted by the fits gate — the int8 twin of the other
    kernel sweeps."""
    from nwhead_tpu.models.quantize import QDense
    from nwhead_tpu.ops.pallas_attn import (
        fused_attention_qkv, fused_attention_qkv_int8, int8_attention_fits)

    sweep_rng = np.random.default_rng(2030)

    def mk_qdense(din, dout):
        w = sweep_rng.standard_normal((din, dout)).astype(np.float32) * 0.1
        s = np.abs(w).max(0) / 127.0
        wq = np.clip(np.round(w / s), -127, 127).astype(np.int8)
        b = sweep_rng.standard_normal((dout,)).astype(np.float32) * 0.01
        return QDense(jnp.asarray(wq), jnp.asarray(s), jnp.asarray(b),
                      jnp.float32(0.05))

    done = 0
    for trial in range(20):
        if done >= 6:
            break
        B = int(sweep_rng.integers(1, 3))
        N = int(sweep_rng.integers(5, 320))
        H = int(sweep_rng.integers(1, 5))
        hd = int(sweep_rng.choice([8, 16, 32, 64]))
        D = H * hd
        if not int8_attention_fits(N, D):
            continue
        done += 1
        ctx = f"trial={trial} B={B} N={N} H={H} hd={hd}"
        x = jnp.asarray(
            sweep_rng.standard_normal((B, N, D)).astype(np.float32)
        ).astype(jnp.bfloat16)
        qkv_d = mk_qdense(D, 3 * D)
        proj_d = mk_qdense(D, D)
        got = np.asarray(
            fused_attention_qkv_int8(
                x, qkv_d.wq, qkv_d.w_scale, qkv_d.bias, qkv_d.act_scale,
                proj_d.wq, proj_d.w_scale, proj_d.bias, proj_d.act_scale, H,
            ).astype(jnp.float32)
        )
        h = qkv_d(x).reshape(B, N, 3, H, hd)
        want = np.asarray(
            proj_d(fused_attention_qkv(h, H)).astype(jnp.float32)
        )
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2,
                                   err_msg=ctx)
    assert done >= 4, f"only {done} accepted shapes in the sweep"


def test_fused_int8_attention_rejects_oversize():
    from nwhead_tpu.ops.pallas_attn import int8_attention_fits

    assert not int8_attention_fits(20000, 768)


def test_rows_are_proper_distributions(rng):
    """Padded key columns must carry zero probability mass: out equals
    attention restricted to the true N."""
    B, H, N, hd = 1, 1, 5, 8
    q = jnp.asarray(rng.standard_normal((B, H, N, hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, N, hd)).astype(np.float32))
    # v rows beyond N would poison the output if padding leaked.
    v = jnp.asarray(np.full((B, H, N, hd), 7.0, np.float32))
    out = np.asarray(fused_attention(q, k, v))
    np.testing.assert_allclose(out, 7.0, rtol=1e-5)


def test_fused_int8_attention_ln_folded(rng):
    """Folding the LayerNorm into the int8 attention kernel must equal
    QLayerNorm -> fused_attention_qkv_int8 exactly (same bf16 round-trip
    before quantization)."""
    from nwhead_tpu.models.quantize import QDense, QLayerNorm
    from nwhead_tpu.ops.pallas_attn import fused_attention_qkv_int8

    B, N, H, hd = 2, 33, 2, 16
    D = H * hd
    x = jnp.asarray(
        rng.standard_normal((B, N, D)).astype(np.float32)
    ).astype(jnp.bfloat16)

    def mk_qdense(din, dout):
        w = rng.standard_normal((din, dout)).astype(np.float32) * 0.1
        s = np.abs(w).max(0) / 127.0
        wq = np.clip(np.round(w / s), -127, 127).astype(np.int8)
        b = rng.standard_normal((dout,)).astype(np.float32) * 0.01
        return QDense(jnp.asarray(wq), jnp.asarray(s), jnp.asarray(b),
                      jnp.float32(0.05))

    qkv_d, proj_d = mk_qdense(D, 3 * D), mk_qdense(D, D)
    ln = QLayerNorm(
        scale=jnp.asarray(1.0 + 0.1 * rng.standard_normal(D).astype(np.float32)),
        bias=jnp.asarray(0.1 * rng.standard_normal(D).astype(np.float32)),
    )

    fused = fused_attention_qkv_int8(
        x, qkv_d.wq, qkv_d.w_scale, qkv_d.bias, qkv_d.act_scale,
        proj_d.wq, proj_d.w_scale, proj_d.bias, proj_d.act_scale, H,
        ln_scale=ln.scale, ln_bias=ln.bias,
    )
    unfused = fused_attention_qkv_int8(
        ln(x), qkv_d.wq, qkv_d.w_scale, qkv_d.bias, qkv_d.act_scale,
        proj_d.wq, proj_d.w_scale, proj_d.bias, proj_d.act_scale, H,
    )
    np.testing.assert_allclose(
        np.asarray(fused.astype(jnp.float32)),
        np.asarray(unfused.astype(jnp.float32)), rtol=1e-5, atol=1e-5,
    )


def test_fused_int8_attention_tail_folds(rng):
    """LayerScale + residual folded in-kernel == the explicit XLA tail
    (bf16 math matched)."""
    from nwhead_tpu.models.quantize import QDense, QLayerNorm
    from nwhead_tpu.ops.pallas_attn import fused_attention_qkv_int8

    B, N, H, hd = 2, 21, 2, 16
    D = H * hd
    x = jnp.asarray(
        rng.standard_normal((B, N, D)).astype(np.float32)
    ).astype(jnp.bfloat16)

    def mk_qdense(din, dout):
        w = rng.standard_normal((din, dout)).astype(np.float32) * 0.1
        s = np.abs(w).max(0) / 127.0
        wq = np.clip(np.round(w / s), -127, 127).astype(np.int8)
        b = rng.standard_normal((dout,)).astype(np.float32) * 0.01
        return QDense(jnp.asarray(wq), jnp.asarray(s), jnp.asarray(b),
                      jnp.float32(0.05))

    qkv_d, proj_d = mk_qdense(D, 3 * D), mk_qdense(D, D)
    ln = QLayerNorm(
        scale=jnp.asarray(1.0 + 0.1 * rng.standard_normal(D).astype(np.float32)),
        bias=jnp.asarray(0.1 * rng.standard_normal(D).astype(np.float32)),
    )
    ls = jnp.asarray((1e-1 * rng.standard_normal(D)).astype(np.float32))

    folded = fused_attention_qkv_int8(
        x, qkv_d.wq, qkv_d.w_scale, qkv_d.bias, qkv_d.act_scale,
        proj_d.wq, proj_d.w_scale, proj_d.bias, proj_d.act_scale, H,
        ln_scale=ln.scale, ln_bias=ln.bias, layerscale=ls, residual=True,
    )
    out = fused_attention_qkv_int8(
        x, qkv_d.wq, qkv_d.w_scale, qkv_d.bias, qkv_d.act_scale,
        proj_d.wq, proj_d.w_scale, proj_d.bias, proj_d.act_scale, H,
        ln_scale=ln.scale, ln_bias=ln.bias,
    )
    want = x + out * ls.astype(out.dtype)
    np.testing.assert_allclose(
        np.asarray(folded.astype(jnp.float32)),
        np.asarray(want.astype(jnp.float32)), rtol=1e-5, atol=1e-5,
    )


def test_fused_int8_attention_flash_tiled(rng, monkeypatch):
    """The int8 kernel's flash-tiled long-N path (forced via a shrunken
    VMEM budget) must equal the single-pass kernel, with all folds on."""
    import nwhead_tpu.ops.pallas_attn as pa
    from nwhead_tpu.models.quantize import QDense, QLayerNorm

    B, N, H, hd = 1, 200, 2, 16
    D = H * hd
    x = jnp.asarray(
        rng.standard_normal((B, N, D)).astype(np.float32)
    ).astype(jnp.bfloat16)

    def mk_qdense(din, dout):
        w = rng.standard_normal((din, dout)).astype(np.float32) * 0.1
        s = np.abs(w).max(0) / 127.0
        wq = np.clip(np.round(w / s), -127, 127).astype(np.int8)
        b = rng.standard_normal((dout,)).astype(np.float32) * 0.01
        return QDense(jnp.asarray(wq), jnp.asarray(s), jnp.asarray(b),
                      jnp.float32(0.05))

    qkv_d, proj_d = mk_qdense(D, 3 * D), mk_qdense(D, D)
    ln = QLayerNorm(
        scale=jnp.asarray(1.0 + 0.1 * rng.standard_normal(D).astype(np.float32)),
        bias=jnp.asarray(0.1 * rng.standard_normal(D).astype(np.float32)),
    )

    def call():
        return np.asarray(pa.fused_attention_qkv_int8(
            x, qkv_d.wq, qkv_d.w_scale, qkv_d.bias, qkv_d.act_scale,
            proj_d.wq, proj_d.w_scale, proj_d.bias, proj_d.act_scale, H,
            ln_scale=ln.scale, ln_bias=ln.bias, residual=True,
        ).astype(jnp.float32))

    want = call()
    monkeypatch.setattr(pa, "_VMEM_LIMIT", 600 * 1024)
    monkeypatch.setattr(pa, "_FLASH_CHUNK", 64)
    assert pa._int8_attn_k_chunk(N, D) == 64  # chunked path selected
    got = call()
    # bf16 probs round at different points (single-pass: p/l before the
    # PV matmul; chunked: p per chunk, f32 normalize after) — agreement
    # is at bf16 resolution, not exact.
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)

    monkeypatch.setattr(pa, "_VMEM_LIMIT", 1024)
    with pytest.raises(ValueError, match="QDense composition"):
        pa._int8_attn_k_chunk(4096, 768)
