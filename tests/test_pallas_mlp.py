"""Fused transformer-MLP kernel (ops/pallas_mlp.py) vs the XLA chain."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nwhead_tpu.ops.pallas_mlp import fused_mlp


def _naive(x, w1, b1, w2, b2):
    h = x @ w1 + b1
    h = jax.nn.gelu(h, approximate=False)
    return h @ w2 + b2


@pytest.mark.parametrize("M,Din,Dh", [(300, 64, 256), (512, 128, 512)])
def test_fused_mlp_matches_naive_f32(rng, M, Din, Dh):
    x = jnp.asarray(rng.standard_normal((M, Din)).astype(np.float32))
    w1 = jnp.asarray((rng.standard_normal((Din, Dh)) * 0.1).astype(np.float32))
    b1 = jnp.asarray(rng.standard_normal(Dh).astype(np.float32))
    w2 = jnp.asarray((rng.standard_normal((Dh, Din)) * 0.1).astype(np.float32))
    b2 = jnp.asarray(rng.standard_normal(Din).astype(np.float32))
    got = np.asarray(fused_mlp(x, w1, b1, w2, b2, block_m=256))
    want = np.asarray(_naive(x, w1, b1, w2, b2))
    # The in-kernel erf is the A&S 7.1.26 approximation (abs err 1.5e-7);
    # through the second matmul that bounds the output error well below
    # any serving-relevant scale.
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fused_mlp_3d_and_bf16(rng):
    B, N, D, Dh = 2, 37, 64, 128
    x = jnp.asarray(
        rng.standard_normal((B, N, D)).astype(np.float32)
    ).astype(jnp.bfloat16)
    w1 = jnp.asarray((rng.standard_normal((D, Dh)) * 0.1).astype(np.float32))
    b1 = jnp.zeros(Dh)
    w2 = jnp.asarray((rng.standard_normal((Dh, D)) * 0.1).astype(np.float32))
    b2 = jnp.zeros(D)
    got = np.asarray(
        fused_mlp(x, w1, b1, w2, b2, block_m=64).astype(jnp.float32)
    )
    assert got.shape == (B, N, D)
    want = np.asarray(
        _naive(x, w1.astype(jnp.bfloat16), b1, w2.astype(jnp.bfloat16), b2)
        .astype(jnp.float32)
    )
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)


def test_vit_fused_impls_match_xla(rng):
    """Flax ViT with attn_impl/mlp_impl='fused' equals the xla forward,
    with identical parameter trees (checkpoint compatible)."""
    import jax.tree_util as jtu

    from nwhead_tpu.models import load_model

    m1 = load_model("vit_s16")
    m2 = load_model("vit_s16", attn_impl="fused", mlp_impl="fused")
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    v1 = m1.init(jax.random.PRNGKey(0), x, train=False)
    v2 = m2.init(jax.random.PRNGKey(0), x, train=False)
    assert jtu.tree_structure(v1) == jtu.tree_structure(v2)
    a = np.asarray(m1.apply(v1, x, train=False))
    b = np.asarray(m2.apply(v1, x, train=False))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_fused_mlp_gradients_match_xla(rng):
    """The custom VJP (recompute + cross-tile weight-grad accumulation)
    must match autodiff through the XLA chain for ALL five inputs."""
    M, Din, Dh = 130, 32, 96
    x = jnp.asarray(rng.standard_normal((M, Din)).astype(np.float32))
    w1 = jnp.asarray((rng.standard_normal((Din, Dh)) * 0.2).astype(np.float32))
    b1 = jnp.asarray(rng.standard_normal(Dh).astype(np.float32) * 0.1)
    w2 = jnp.asarray((rng.standard_normal((Dh, Din)) * 0.2).astype(np.float32))
    b2 = jnp.asarray(rng.standard_normal(Din).astype(np.float32) * 0.1)
    t = jnp.asarray(rng.standard_normal((M, Din)).astype(np.float32))

    def loss_fused(x, w1, b1, w2, b2):
        return jnp.sum(jnp.tanh(fused_mlp(x, w1, b1, w2, b2, block_m=64)) * t)

    def loss_xla(x, w1, b1, w2, b2):
        return jnp.sum(jnp.tanh(_naive(x, w1, b1, w2, b2)) * t)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b, name in zip(gf, gx, ["dx", "dw1", "db1", "dw2", "db2"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4, err_msg=name
        )


def test_vit_fully_fused_trains(rng):
    """Gradient flow through attn_impl='fused' AND mlp_impl='fused'."""
    from nwhead_tpu.models import load_model

    m = load_model("vit_s16", attn_impl="fused", mlp_impl="fused")
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, train=False)

    def loss(params):
        f = m.apply({"params": params}, x, train=True)
        return jnp.sum(f * f)

    g = jax.grad(loss)(v["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(t)).all() for t in leaves)
    gm = np.asarray(g["block0"]["mlp"]["fc1"]["kernel"])
    assert np.abs(gm).max() > 0


def test_fused_mlp_randomized_property_sweep():
    """Seeded randomized sweep over fused_mlp's space — M/Din/Dh/Dout x
    2-D/3-D input x block_m x dtype — vs the XLA chain, with spot grad
    checks (the kernel-sweep pattern that caught a real block_s bug in the
    NW kernel)."""
    sweep_rng = np.random.default_rng(2028)
    for trial in range(8):
        Din = int(sweep_rng.choice([16, 48, 64, 96]))
        Dh = int(sweep_rng.choice([32, 128, 200, 256]))
        Dout = int(sweep_rng.choice([16, 64, 96]))
        three_d = bool(sweep_rng.integers(2))
        bf16 = bool(sweep_rng.integers(2))
        block_m = int(sweep_rng.choice([64, 128, 512]))
        if three_d:
            B = int(sweep_rng.integers(1, 4))
            N = int(sweep_rng.integers(3, 80))
            shape = (B, N, Din)
        else:
            shape = (int(sweep_rng.integers(1, 400)), Din)
        ctx = f"trial={trial} shape={shape} Dh={Dh} Dout={Dout} bm={block_m} bf16={bf16}"
        x = jnp.asarray(sweep_rng.standard_normal(shape).astype(np.float32))
        w1 = jnp.asarray(
            (sweep_rng.standard_normal((Din, Dh)) * 0.1).astype(np.float32)
        )
        b1 = jnp.asarray(sweep_rng.standard_normal(Dh).astype(np.float32))
        w2 = jnp.asarray(
            (sweep_rng.standard_normal((Dh, Dout)) * 0.1).astype(np.float32)
        )
        b2 = jnp.asarray(sweep_rng.standard_normal(Dout).astype(np.float32))
        if bf16:
            xb = x.astype(jnp.bfloat16)
            got = np.asarray(
                fused_mlp(xb, w1, b1, w2, b2, block_m=block_m)
                .astype(jnp.float32)
            )
            want = np.asarray(_naive(
                xb, w1.astype(jnp.bfloat16), b1, w2.astype(jnp.bfloat16), b2
            ).astype(jnp.float32))
            np.testing.assert_allclose(got, want, rtol=6e-2, atol=6e-2,
                                       err_msg=ctx)
        else:
            got = np.asarray(fused_mlp(x, w1, b1, w2, b2, block_m=block_m))
            want = np.asarray(_naive(x, w1, b1, w2, b2))
            np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4,
                                       err_msg=ctx)
            if trial % 4 == 0:
                def loss_f(fn):
                    def f(x_, w1_, w2_):
                        return jnp.sum(jnp.tanh(fn(x_, w1_, b1, w2_, b2)))
                    return f

                gf = jax.grad(loss_f(
                    lambda *a, **k: fused_mlp(*a, block_m=block_m, **k)
                ), argnums=(0, 1, 2))(x, w1, w2)
                gx = jax.grad(loss_f(_naive), argnums=(0, 1, 2))(x, w1, w2)
                for a, b, name in zip(gf, gx, ("dx", "dw1", "dw2")):
                    np.testing.assert_allclose(
                        np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4,
                        err_msg=f"{name} {ctx}",
                    )


def test_fused_int8_mlp_tiling_invariance_sweep(rng):
    """Seeded sweep: the int8 MLP kernel's output must be invariant to the
    token tile size (block_m) across random shapes and random fold flags
    (LN / LayerScale / residual) — tile boundaries and M-padding are where
    kernel bugs live (cf. the NW kernel's block_s bug)."""
    from nwhead_tpu.models.quantize import QLayerNorm
    from nwhead_tpu.ops.pallas_mlp import fused_mlp_int8

    sweep_rng = np.random.default_rng(2029)

    def mk_q(din, dout):
        w = sweep_rng.standard_normal((din, dout)).astype(np.float32) * 0.1
        s = np.abs(w).max(0) / 127.0
        wq = np.clip(np.round(w / s), -127, 127).astype(np.int8)
        b = sweep_rng.standard_normal((dout,)).astype(np.float32) * 0.01
        return jnp.asarray(wq), jnp.asarray(s), jnp.asarray(b)

    for trial in range(6):
        D = int(sweep_rng.choice([16, 32, 64]))
        Dh = int(sweep_rng.choice([64, 128, 192]))
        B = int(sweep_rng.integers(1, 3))
        N = int(sweep_rng.integers(3, 200))
        block_m = int(sweep_rng.choice([64, 128, 256]))
        use_ln = bool(sweep_rng.integers(2))
        use_ls = bool(sweep_rng.integers(2))
        residual = bool(sweep_rng.integers(2))
        ctx = (f"trial={trial} B={B} N={N} D={D} Dh={Dh} bm={block_m} "
               f"ln={use_ln} ls={use_ls} res={residual}")
        x = jnp.asarray(
            sweep_rng.standard_normal((B, N, D)).astype(np.float32)
        ).astype(jnp.bfloat16)
        wq1, s1, b1 = mk_q(D, Dh)
        wq2, s2, b2 = mk_q(Dh, D)
        kw = {}
        if use_ln:
            ln = QLayerNorm(
                scale=jnp.asarray(
                    1.0 + 0.1 * sweep_rng.standard_normal(D).astype(np.float32)
                ),
                bias=jnp.asarray(
                    0.1 * sweep_rng.standard_normal(D).astype(np.float32)
                ),
            )
            kw = {"ln_scale": ln.scale, "ln_bias": ln.bias}
        if use_ls:
            kw["layerscale"] = jnp.asarray(
                0.1 * sweep_rng.standard_normal(D).astype(np.float32)
            )
        kw["residual"] = residual
        small = fused_mlp_int8(
            x, wq1, s1, b1, 0.05, wq2, s2, b2, 0.05, block_m=block_m, **kw
        )
        big = fused_mlp_int8(
            x, wq1, s1, b1, 0.05, wq2, s2, b2, 0.05, block_m=1024, **kw
        )
        np.testing.assert_allclose(
            np.asarray(small.astype(jnp.float32)),
            np.asarray(big.astype(jnp.float32)),
            rtol=1e-5, atol=1e-5, err_msg=ctx,
        )


def test_fused_int8_mlp_ln_folded(rng):
    """Folding the LayerNorm into the int8 MLP kernel must equal
    QLayerNorm -> fused_mlp_int8 exactly."""
    from nwhead_tpu.models.quantize import QLayerNorm
    from nwhead_tpu.ops.pallas_mlp import fused_mlp_int8

    B, N, D, Dh = 2, 19, 32, 128
    x = jnp.asarray(
        rng.standard_normal((B, N, D)).astype(np.float32)
    ).astype(jnp.bfloat16)

    def mk_q(din, dout):
        w = rng.standard_normal((din, dout)).astype(np.float32) * 0.1
        s = np.abs(w).max(0) / 127.0
        wq = np.clip(np.round(w / s), -127, 127).astype(np.int8)
        b = rng.standard_normal((dout,)).astype(np.float32) * 0.01
        return jnp.asarray(wq), jnp.asarray(s), jnp.asarray(b)

    wq1, s1, b1 = mk_q(D, Dh)
    wq2, s2, b2 = mk_q(Dh, D)
    ln = QLayerNorm(
        scale=jnp.asarray(1.0 + 0.1 * rng.standard_normal(D).astype(np.float32)),
        bias=jnp.asarray(0.1 * rng.standard_normal(D).astype(np.float32)),
    )

    fused = fused_mlp_int8(x, wq1, s1, b1, 0.05, wq2, s2, b2, 0.05,
                           ln_scale=ln.scale, ln_bias=ln.bias)
    unfused = fused_mlp_int8(ln(x), wq1, s1, b1, 0.05, wq2, s2, b2, 0.05)
    np.testing.assert_allclose(
        np.asarray(fused.astype(jnp.float32)),
        np.asarray(unfused.astype(jnp.float32)), rtol=1e-5, atol=1e-5,
    )


def test_fused_int8_mlp_tail_folds(rng):
    """LayerScale + residual folded in-kernel == the explicit XLA tail."""
    from nwhead_tpu.models.quantize import QLayerNorm
    from nwhead_tpu.ops.pallas_mlp import fused_mlp_int8

    B, N, D, Dh = 2, 13, 32, 128
    x = jnp.asarray(
        rng.standard_normal((B, N, D)).astype(np.float32)
    ).astype(jnp.bfloat16)

    def mk_q(din, dout):
        w = rng.standard_normal((din, dout)).astype(np.float32) * 0.1
        s = np.abs(w).max(0) / 127.0
        wq = np.clip(np.round(w / s), -127, 127).astype(np.int8)
        b = rng.standard_normal((dout,)).astype(np.float32) * 0.01
        return jnp.asarray(wq), jnp.asarray(s), jnp.asarray(b)

    wq1, s1, b1 = mk_q(D, Dh)
    wq2, s2, b2 = mk_q(Dh, D)
    ln = QLayerNorm(
        scale=jnp.asarray(1.0 + 0.1 * rng.standard_normal(D).astype(np.float32)),
        bias=jnp.asarray(0.1 * rng.standard_normal(D).astype(np.float32)),
    )
    ls = jnp.asarray((1e-1 * rng.standard_normal(D)).astype(np.float32))

    folded = fused_mlp_int8(x, wq1, s1, b1, 0.05, wq2, s2, b2, 0.05,
                            ln_scale=ln.scale, ln_bias=ln.bias,
                            layerscale=ls, residual=True)
    out = fused_mlp_int8(x, wq1, s1, b1, 0.05, wq2, s2, b2, 0.05,
                         ln_scale=ln.scale, ln_bias=ln.bias)
    want = x + out * ls.astype(out.dtype)
    np.testing.assert_allclose(
        np.asarray(folded.astype(jnp.float32)),
        np.asarray(want.astype(jnp.float32)), rtol=1e-5, atol=1e-5,
    )

    import pytest

    with pytest.raises(ValueError, match="D_out == D_in"):
        fused_mlp_int8(x, wq1, s1, b1, 0.05,
                       mk_q(Dh, D + 32)[0], *mk_q(Dh, D + 32)[1:], 0.05,
                       residual=True)
