"""Fused NW kernel tests: fused == naive (values and grads), masking,
all kernel variants, odd shapes. Runs in Pallas interpret mode on CPU; the
same code path compiles on TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nwhead_tpu.ops.nw import nw_log_probs
from nwhead_tpu.ops.pallas_nw import nw_fused_log_probs

KERNELS = ["euclidean", "hypersphere_euclidean", "cosine", "dotproduct", "clip"]


def _problem(rng, B=4, S=600, D=32, C=7):
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((S, D)).astype(np.float32))
    sy = jnp.asarray(rng.integers(0, C, size=S).astype(np.int32))
    return q, s, sy, C


@pytest.mark.parametrize("kernel", KERNELS)
def test_fused_matches_naive(rng, kernel):
    q, s, sy, C = _problem(rng)
    kparams = {"logit_scale": jnp.float32(np.log(1 / 0.07))} if kernel == "clip" else {}
    got = np.asarray(
        nw_fused_log_probs(q, s, sy, C, kernel=kernel, kernel_params=kparams, block_s=256)
    )
    want = np.asarray(nw_log_probs(q, s, sy, C, kernel=kernel, kernel_params=kparams))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)  # fp32 S-length aggregation noise


def test_fused_non_divisible_shapes(rng):
    """S and B not multiples of the block sizes — padding must be exact."""
    q, s, sy, C = _problem(rng, B=5, S=333, D=24, C=3)
    got = np.asarray(nw_fused_log_probs(q, s, sy, C, block_b=8, block_s=128))
    want = np.asarray(nw_log_probs(q, s, sy, C))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)  # fp32 S-length aggregation noise


def test_fused_support_mask(rng):
    q, s, sy, C = _problem(rng, S=512)
    keep = 200
    mask = jnp.asarray((np.arange(512) < keep).astype(np.float32))
    got = np.asarray(nw_fused_log_probs(q, s, sy, C, support_mask=mask, block_s=128))
    want = np.asarray(nw_log_probs(q[:, :], s[:keep], sy[:keep], C))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)  # fp32 S-length aggregation noise


def test_fused_grads_match_naive(rng):
    q, s, sy, C = _problem(rng, B=3, S=300, D=16, C=4)
    labels = jnp.asarray(np.arange(3) % C)

    def loss_fused(q, s):
        lp = nw_fused_log_probs(q, s, sy, C, block_s=128)
        return -jnp.mean(jnp.take_along_axis(lp, labels[:, None], axis=-1))

    def loss_naive(q, s):
        lp = nw_log_probs(q, s, sy, C)
        return -jnp.mean(jnp.take_along_axis(lp, labels[:, None], axis=-1))

    gq_f, gs_f = jax.grad(loss_fused, argnums=(0, 1))(q, s)
    gq_n, gs_n = jax.grad(loss_naive, argnums=(0, 1))(q, s)
    np.testing.assert_allclose(np.asarray(gq_f), np.asarray(gq_n), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gs_f), np.asarray(gs_n), rtol=1e-3, atol=1e-5)


def test_fused_clip_scale_grad(rng):
    """clip's logit_scale must receive gradient through the fused op."""
    q, s, sy, C = _problem(rng, B=2, S=256, D=8, C=3)
    labels = jnp.asarray([0, 1])

    def loss(log_scale):
        lp = nw_fused_log_probs(
            q, s, sy, C, kernel="clip", kernel_params={"logit_scale": log_scale},
            block_s=128,
        )
        return -jnp.mean(jnp.take_along_axis(lp, labels[:, None], axis=-1))

    g = jax.grad(loss)(jnp.float32(np.log(1 / 0.07)))
    assert np.isfinite(float(g)) and abs(float(g)) > 0

    # Against naive autodiff.
    def loss_naive(log_scale):
        from nwhead_tpu.ops.nw import nw_log_probs as naive

        lp = naive(q, s, sy, C, kernel="clip", kernel_params={"logit_scale": log_scale})
        return -jnp.mean(jnp.take_along_axis(lp, labels[:, None], axis=-1))

    g_n = jax.grad(loss_naive)(jnp.float32(np.log(1 / 0.07)))
    np.testing.assert_allclose(float(g), float(g_n), rtol=1e-3)


def test_fused_under_jit(rng):
    q, s, sy, C = _problem(rng, S=256)

    @jax.jit
    def f(q, s):
        return nw_fused_log_probs(q, s, sy, C, block_s=128)

    got = np.asarray(f(q, s))
    want = np.asarray(nw_log_probs(q, s, sy, C))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)  # fp32 S-length aggregation noise


def test_probabilities_renormalize_exactly(rng):
    """exp(out) must sum to 1 (+ C*1e-12) — online softmax is exact."""
    q, s, sy, C = _problem(rng, S=1024)
    out = np.asarray(nw_fused_log_probs(q, s, sy, C, block_s=256))
    np.testing.assert_allclose(np.exp(out).sum(-1), 1.0, rtol=1e-5)


def test_fused_partials_match_merge(rng):
    """Partials from the fused kernel, merged across fake shards, must equal
    the single-shot op (the distributed full-mode path)."""
    from nwhead_tpu.ops.pallas_nw import nw_fused_partials
    from nwhead_tpu.parallel.sharded_bank import _NEG_INF as NEG

    B, S, D, C = 4, 512, 32, 7
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    s = np.asarray(rng.standard_normal((S, D)).astype(np.float32))
    sy = np.asarray(rng.integers(0, C, size=S).astype(np.int32))

    # Two "shards".
    parts = []
    for sl in (slice(0, 256), slice(256, 512)):
        m, l, acc = nw_fused_partials(
            q, jnp.asarray(s[sl]), jnp.asarray(sy[sl]), C, block_s=128
        )
        parts.append((np.asarray(m), np.asarray(l), np.asarray(acc)))

    m_g = np.maximum(parts[0][0], parts[1][0])
    l_g = sum(p[1] * np.exp(p[0] - m_g) for p in parts)
    acc_g = sum(p[2] * np.exp(p[0] - m_g) for p in parts)
    got = np.log(acc_g / np.maximum(l_g, 1e-30) + 1e-12)

    want = np.asarray(nw_log_probs(q, jnp.asarray(s), jnp.asarray(sy), C))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_fused_unaligned_feature_dim(rng):
    """D not a multiple of the 128-lane width (e.g. proj_dim=100) must work,
    values and grads."""
    q, s, sy, C = _problem(rng, B=3, S=260, D=100, C=5)
    got = np.asarray(nw_fused_log_probs(q, s, sy, C, block_s=128))
    want = np.asarray(nw_log_probs(q, s, sy, C))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    labels = jnp.asarray(np.arange(3) % C)

    def loss(head):
        def f(q, s):
            lp = head(q, s)
            return -jnp.mean(jnp.take_along_axis(lp, labels[:, None], axis=-1))
        return f

    gq_f, gs_f = jax.grad(loss(lambda q, s: nw_fused_log_probs(q, s, sy, C, block_s=128)), argnums=(0, 1))(q, s)
    gq_n, gs_n = jax.grad(loss(lambda q, s: nw_log_probs(q, s, sy, C)), argnums=(0, 1))(q, s)
    np.testing.assert_allclose(np.asarray(gq_f), np.asarray(gq_n), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gs_f), np.asarray(gs_n), rtol=1e-3, atol=1e-5)


def test_fused_many_classes_int32_labels(rng):
    """C > 256 takes the int32 label path (bf16 packing only covers <=256)."""
    q, s, sy, C = _problem(rng, B=3, S=300, D=16, C=300)
    got = np.asarray(nw_fused_log_probs(q, s, sy, C, block_s=128))
    want = np.asarray(nw_log_probs(q, s, sy, C))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


class TestPreparedSupport:
    """The serving fast path (prepare once, stream per call) must equal the
    raw-array fused path and the naive op exactly."""

    @pytest.mark.parametrize("kernel", [
        "euclidean", "hypersphere_euclidean", "cosine", "dotproduct", "clip",
    ])
    def test_prepared_matches_naive(self, rng, kernel):
        from nwhead_tpu.ops.nw import nw_log_probs
        from nwhead_tpu.ops.pallas_nw import (
            nw_fused_log_probs, prepare_support,
        )

        B, S, D, C = 6, 300, 40, 7
        q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
        s = jnp.asarray(rng.standard_normal((S, D)).astype(np.float32))
        sy = jnp.asarray(rng.integers(0, C, size=S).astype(np.int32))
        kparams = {"logit_scale": jnp.float32(1.3)} if kernel == "clip" else {}

        prepared = prepare_support(s, sy, C, kernel=kernel)
        got = np.asarray(nw_fused_log_probs(
            q, prepared, None, C, kernel=kernel, kernel_params=kparams,
        ))
        want = np.asarray(nw_log_probs(q, s, sy, C, kernel=kernel,
                                       kernel_params=kparams))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("B", [136, 200, 256])
    def test_prepared_whole_batch_tile_default(self, rng, B):
        """The default block_b is now the VMEM-budgeted WHOLE batch (one
        query tile -> the bank streams once per call); batches above 128,
        including non-128-multiples, must stay exact — with and without a
        class window (C > 128)."""
        from nwhead_tpu.ops.nw import nw_log_probs
        from nwhead_tpu.ops.pallas_nw import (
            nw_fused_log_probs, prepare_support,
        )

        S, D, C = 500, 40, 500  # c_pad = 512
        q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
        s = jnp.asarray(rng.standard_normal((S, D)).astype(np.float32))
        sy = jnp.asarray(np.sort(rng.integers(0, C, size=S)).astype(np.int32))

        want = np.asarray(nw_log_probs(q, s, sy, C))
        for window in (True, False):
            # block_s=128 forces multiple tiles whose sorted-label spans
            # (~128 classes each) are guaranteed narrower than c_pad, so a
            # window MUST materialize; the default single-tile prep at this
            # S would legitimately drop it (full-width span).
            prepared = prepare_support(s, sy, C, window=window, block_s=128)
            assert (prepared.win is not None) == window
            got = np.asarray(nw_fused_log_probs(q, prepared, None, C))
            np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4,
                                       err_msg=f"window={window}")

    @pytest.mark.parametrize("precision", ["f32", "int8"])
    def test_prepared_softmax_impl_variants_identical(self, rng, precision):
        """The exp_noguard / exp2_noguard softmax implementations must
        produce the SAME probabilities as the guarded exp baseline —
        including with masked rows, whose finite-huge-negative scores must
        underflow to exactly 0 without the per-element where."""
        from nwhead_tpu.ops.pallas_nw import (
            nw_fused_log_probs, prepare_support,
        )

        B, S, D, C = 8, 400, 32, 300
        q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
        s = jnp.asarray(rng.standard_normal((S, D)).astype(np.float32))
        sy = jnp.asarray(np.sort(rng.integers(0, C, size=S)).astype(np.int32))
        mask = jnp.asarray((rng.random(S) > 0.3).astype(np.float32))

        prep = prepare_support(s, sy, C, support_mask=mask,
                               precision=precision, block_s=128)
        base = np.asarray(nw_fused_log_probs(q, prep, None, C))
        for impl in ("exp_noguard", "exp2_noguard"):
            got = np.asarray(
                nw_fused_log_probs(q, prep, None, C, softmax_impl=impl))
            np.testing.assert_allclose(
                np.exp(got), np.exp(base), rtol=0, atol=3e-7,
                err_msg=f"{impl} {precision}")

    @pytest.mark.parametrize("precision", ["f32", "bf16", "int8"])
    def test_prepared_fold2_chain_parity(self, rng, precision):
        """The fold2 score-chain rewrite (caller pre-doubles q/qscale so the
        kernel drops its per-element 2.0*dot multiply; q2 hoisted out of the
        tile loop) must be BIT-identical for l2 kernels at every precision —
        the doubling is a power-of-2 scaling, which commutes with rounding.
        The quant dot-mode scale fold changes one f32 rounding order, so it
        gets a tolerance instead."""
        from nwhead_tpu.ops.pallas_nw import (
            nw_fused_from_prepared, prepare_support,
        )

        B, S, D, C = 8, 400, 32, 300  # C > 128 → windowed aggregation too
        q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
        s = jnp.asarray(rng.standard_normal((S, D)).astype(np.float32))
        sy = jnp.asarray(rng.integers(0, C, size=S).astype(np.int32))
        mask = jnp.asarray((rng.random(S) > 0.3).astype(np.float32))

        prep = prepare_support(s, sy, C, support_mask=mask,
                               precision=precision, block_s=128)
        old = np.asarray(
            nw_fused_from_prepared(q, prep, C, _fold2=False))
        new = np.asarray(
            nw_fused_from_prepared(q, prep, C, _fold2=True))
        if precision == "int8":
            # Interpret mode runs on XLA CPU, whose FMA contraction breaks
            # exact equality for the int8 dequant chain at the last-ulp
            # level (max log diff ~1e-6 observed); the compiled Mosaic
            # kernel measured bit-identical on chip (scripts/fold_lab.py).
            np.testing.assert_allclose(new, old, rtol=0, atol=1e-5)
        else:
            np.testing.assert_array_equal(old, new)

        if precision == "int8":
            prep_c = prepare_support(s, sy, C, support_mask=mask,
                                     kernel="clip", precision="int8",
                                     block_s=128)
            kp = {"logit_scale": jnp.float32(np.log(1 / 0.07))}
            old = np.asarray(nw_fused_from_prepared(
                q, prep_c, C, kernel="clip", kernel_params=kp, _fold2=False))
            new = np.asarray(nw_fused_from_prepared(
                q, prep_c, C, kernel="clip", kernel_params=kp, _fold2=True))
            np.testing.assert_allclose(np.exp(new), np.exp(old),
                                       rtol=0, atol=1e-6)

    def test_prepared_with_mask(self, rng):
        from nwhead_tpu.ops.nw import nw_log_probs
        from nwhead_tpu.ops.pallas_nw import (
            nw_fused_log_probs, prepare_support,
        )

        B, S, D, C = 4, 200, 24, 5
        q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
        s = jnp.asarray(rng.standard_normal((S, D)).astype(np.float32))
        sy = jnp.asarray(rng.integers(0, C, size=S).astype(np.int32))
        mask = jnp.asarray((rng.random(S) > 0.3).astype(np.float32))

        prepared = prepare_support(s, sy, C, support_mask=mask)
        got = np.asarray(nw_fused_log_probs(q, prepared, None, C))
        want = np.asarray(nw_log_probs(q, s, sy, C, support_mask=mask))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_prepared_masked_rows_with_nan_content(self, rng):
        """Masked rows may hold untrusted content — NaN/Inf in a masked row
        must not poison the prepared path (prepare_support zeroes masked
        features; validity rides the folded self-norms + label sentinel)."""
        from nwhead_tpu.ops.nw import nw_log_probs
        from nwhead_tpu.ops.pallas_nw import (
            nw_fused_log_probs, prepare_support,
        )

        B, S, D, C = 4, 200, 24, 5
        q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
        s_np = rng.standard_normal((S, D)).astype(np.float32)
        sy = jnp.asarray(rng.integers(0, C, size=S).astype(np.int32))
        mask_np = (rng.random(S) > 0.3).astype(np.float32)
        # Corrupt every masked row — the reason a caller masks rows out.
        s_np[mask_np == 0] = np.nan
        s_np[np.argmin(mask_np)] = np.inf

        prepared = prepare_support(
            jnp.asarray(s_np), sy, C, support_mask=jnp.asarray(mask_np)
        )
        for arr in prepared:
            if arr is not None:
                assert np.isfinite(np.asarray(arr, np.float32)).all()
        got = np.asarray(nw_fused_log_probs(q, prepared, None, C))
        assert np.isfinite(got).all()
        # Equal to the clean-bank result: masked content must not matter.
        s_clean = np.where(mask_np[:, None] > 0, s_np, 0.0)
        want = np.asarray(nw_log_probs(
            q, jnp.asarray(s_clean), sy, C,
            support_mask=jnp.asarray(mask_np),
        ))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_prepared_partials_match_merge(self, rng):
        """Prepared-path partials equal the raw-path partials (sharded
        serving can pre-prepare per-shard banks)."""
        from nwhead_tpu.ops.pallas_nw import (
            nw_fused_from_prepared, nw_fused_partials, prepare_support,
        )

        B, S, D, C = 4, 260, 32, 6
        q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
        s = jnp.asarray(rng.standard_normal((S, D)).astype(np.float32))
        sy = jnp.asarray(rng.integers(0, C, size=S).astype(np.int32))

        prepared = prepare_support(s, sy, C)
        m1, l1, a1 = nw_fused_from_prepared(q, prepared, C, partials=True)
        m2, l2, a2 = nw_fused_partials(q, s, sy, C)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-4, atol=1e-5)

    def test_prepared_bf16(self, rng):
        from nwhead_tpu.ops.nw import nw_log_probs
        from nwhead_tpu.ops.pallas_nw import (
            nw_fused_log_probs, prepare_support,
        )

        B, S, D, C = 4, 300, 32, 5
        q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
        s = jnp.asarray(rng.standard_normal((S, D)).astype(np.float32))
        sy = jnp.asarray(rng.integers(0, C, size=S).astype(np.int32))
        prepared = prepare_support(s, sy, C, precision="bf16")
        assert prepared.s.dtype == jnp.bfloat16
        got = np.asarray(nw_fused_log_probs(q, prepared, None, C))
        want = np.asarray(nw_log_probs(q, s, sy, C))
        # bf16 bank: coarse agreement on log-probs.
        np.testing.assert_allclose(got, want, rtol=0.1, atol=0.05)


class TestPreparedDispatchValidation:
    def _mk(self, rng):
        from nwhead_tpu.ops.pallas_nw import prepare_support

        s = jnp.asarray(rng.standard_normal((200, 24)).astype(np.float32))
        sy = jnp.asarray(rng.integers(0, 5, size=200).astype(np.int32))
        q = jnp.asarray(rng.standard_normal((4, 24)).astype(np.float32))
        return q, s, sy, prepare_support(s, sy, 5)

    def test_mask_must_be_baked_in(self, rng):
        q, s, sy, prep = self._mk(rng)
        with pytest.raises(ValueError, match="prepare_support time"):
            nw_fused_log_probs(q, prep, None, 5, support_mask=jnp.ones(200))

    def test_precision_mismatch_rejected(self, rng):
        q, s, sy, prep = self._mk(rng)
        with pytest.raises(ValueError, match="prepared bank"):
            nw_fused_log_probs(q, prep, None, 5, precision="bf16")

    def test_n_classes_required(self, rng):
        q, s, sy, prep = self._mk(rng)
        with pytest.raises(ValueError, match="n_classes"):
            nw_fused_log_probs(q, prep, None, None)

    def test_label_range_validated_at_prepare(self, rng):
        from nwhead_tpu.ops.pallas_nw import prepare_support

        s = jnp.asarray(rng.standard_normal((64, 16)).astype(np.float32))
        sy = jnp.asarray(np.full(64, 9, np.int32))
        with pytest.raises(ValueError, match="out of range"):
            prepare_support(s, sy, 5)


class TestInt8Bank:
    """int8 quantized serving banks: 4x less bank traffic than f32, scores
    dequantized in-kernel from per-row symmetric scales."""

    def test_int8_close_to_f32(self, rng):
        from nwhead_tpu.ops.nw import nw_log_probs
        from nwhead_tpu.ops.pallas_nw import (
            nw_fused_log_probs, prepare_support,
        )

        B, S, D, C = 16, 600, 64, 8
        # Well-separated class clusters: quantization must not flip argmax.
        centers = rng.standard_normal((C, D)).astype(np.float32) * 3
        sy_np = rng.integers(0, C, size=S).astype(np.int32)
        s = centers[sy_np] + rng.standard_normal((S, D)).astype(np.float32) * 0.3
        qy = rng.integers(0, C, size=B).astype(np.int32)
        q = centers[qy] + rng.standard_normal((B, D)).astype(np.float32) * 0.3

        prep = prepare_support(jnp.asarray(s), jnp.asarray(sy_np), C,
                               precision="int8")
        assert prep.s.dtype == jnp.int8 and prep.sscale is not None
        got = np.asarray(nw_fused_log_probs(jnp.asarray(q), prep, None, C))
        want = np.asarray(nw_log_probs(jnp.asarray(q), jnp.asarray(s),
                                       jnp.asarray(sy_np), C))
        # argmax identical on separable data; log-probs close.
        np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))
        assert np.max(np.abs(np.exp(got) - np.exp(want))) < 0.05

    def test_int8_kernels_and_mask(self, rng):
        from nwhead_tpu.ops.nw import nw_log_probs
        from nwhead_tpu.ops.pallas_nw import (
            nw_fused_log_probs, prepare_support,
        )

        B, S, D, C = 4, 300, 32, 5
        q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
        s = jnp.asarray(rng.standard_normal((S, D)).astype(np.float32))
        sy = jnp.asarray(rng.integers(0, C, size=S).astype(np.int32))
        mask = jnp.asarray((rng.random(S) > 0.3).astype(np.float32))
        for kernel in ("euclidean", "cosine"):
            prep = prepare_support(s, sy, C, kernel=kernel, precision="int8",
                                   support_mask=mask)
            got = np.asarray(nw_fused_log_probs(q, prep, None, C, kernel=kernel))
            want = np.asarray(nw_log_probs(q, s, sy, C, kernel=kernel,
                                           support_mask=mask))
            assert np.max(np.abs(np.exp(got) - np.exp(want))) < 0.08, kernel

    def test_int8_partials_merge_matches_full(self, rng):
        """int8 prepared partials, finalized by hand, equal the int8
        prepared log-probs (the sharded int8 serving path is exact vs the
        single-device int8 path)."""
        from nwhead_tpu.ops.pallas_nw import (
            nw_fused_from_prepared, prepare_support,
        )

        s = jnp.asarray(rng.standard_normal((200, 16)).astype(np.float32))
        sy = jnp.asarray(rng.integers(0, 4, size=200).astype(np.int32))
        q = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32))
        prep = prepare_support(s, sy, 4, precision="int8")
        m, l, acc = nw_fused_from_prepared(q, prep, 4, partials=True)
        got = np.log(
            np.asarray(acc) / np.maximum(np.asarray(l), 1e-30) + 1e-12
        )
        want = np.asarray(nw_fused_from_prepared(q, prep, 4))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def _unpack_int4(prep):
    """Host-side inverse of prepare_support's nibble packing: (S_pad, D_pad)
    f32 dequantized rows from the uint8-packed bank + per-row scales."""
    packed = np.asarray(prep.s).astype(np.int32)
    lo = (packed & 15) - 8  # lo nibble is stored biased (+8)
    hi = packed >> 4
    hi = hi - 16 * (hi > 7)
    codes = np.concatenate([lo, hi], axis=1).astype(np.float32)
    scale = np.asarray(prep.sscale).reshape(-1)
    return codes * scale[:, None], codes


class TestInt4Bank:
    """int4 nibble-packed serving banks (stored uint8 — the dtype is the
    marker): 8x less bank DMA than f32, 2x the rows per chip vs int8. The
    kernel unpacks each streamed tile to int8 on the VPU and reuses the
    int8 MXU dot/dequant chain, so every int8 bank property must hold."""

    def test_int4_pack_roundtrip_exact(self, rng):
        from nwhead_tpu.ops.pallas_nw import prepare_support

        S, D, C = 300, 48, 5  # D not a multiple of 256 -> pad path
        s = rng.standard_normal((S, D)).astype(np.float32)
        sy = rng.integers(0, C, size=S).astype(np.int32)
        prep = prepare_support(jnp.asarray(s), jnp.asarray(sy), C,
                               precision="int4")
        assert prep.s.dtype == jnp.uint8
        assert prep.s.shape[1] == 256 // 2  # d_pad=256, packed halves
        s_deq, codes = _unpack_int4(prep)
        assert np.all(codes >= -7) and np.all(codes <= 7)
        # Dequantization error bounded by half a quantization step per
        # element (symmetric round-to-nearest at amax/7).
        step = np.max(np.abs(s), axis=1, keepdims=True) / 7.0
        err = np.abs(s_deq[:S, :D] - s)
        assert np.all(err <= step * 0.5 + 1e-6)
        # Padding columns dequantize to exact zero.
        assert np.all(s_deq[:S, D:] == 0.0)
        # l2 self-norms must be the DEQUANTIZED bank's norms (exactly).
        got_s2 = np.asarray(prep.s2c).reshape(-1)[:S]
        np.testing.assert_allclose(
            got_s2, np.sum(s_deq[:S] ** 2, axis=1), rtol=1e-6)

    def test_int4_close_to_f32(self, rng):
        from nwhead_tpu.ops.nw import nw_log_probs
        from nwhead_tpu.ops.pallas_nw import (
            nw_fused_log_probs, prepare_support,
        )

        B, S, D, C = 16, 600, 64, 8
        centers = rng.standard_normal((C, D)).astype(np.float32) * 3
        sy_np = rng.integers(0, C, size=S).astype(np.int32)
        s = centers[sy_np] + rng.standard_normal((S, D)).astype(np.float32) * 0.3
        qy = rng.integers(0, C, size=B).astype(np.int32)
        q = centers[qy] + rng.standard_normal((B, D)).astype(np.float32) * 0.3

        prep = prepare_support(jnp.asarray(s), jnp.asarray(sy_np), C,
                               precision="int4")
        got = np.asarray(nw_fused_log_probs(jnp.asarray(q), prep, None, C))
        want = np.asarray(nw_log_probs(jnp.asarray(q), jnp.asarray(s),
                                       jnp.asarray(sy_np), C))
        np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))
        assert np.max(np.abs(np.exp(got) - np.exp(want))) < 0.05

    def test_int4_kernels_and_mask(self, rng):
        """Two claims, separately: (a) KERNEL CORRECTNESS — the fused chain
        over an int4 bank equals the naive op on the dequantized codes and
        the identically-quantized query (tight gate: the quantization is
        the data, not the op); (b) ACCURACY — vs the float bank the int4
        noise stays small for the normalized-geometry kernels (euclidean /
        cosine). Raw dotproduct amplifies 4-bit feature noise through
        unbounded score magnitudes (measured ~0.3 prob err on random
        gaussians) — correctness is still asserted via (a); use int8 there.
        """
        from nwhead_tpu.ops.nw import nw_log_probs
        from nwhead_tpu.ops.pallas_nw import (
            nw_fused_log_probs, prepare_support,
        )

        B, S, D, C = 4, 300, 32, 5
        q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
        s = jnp.asarray(rng.standard_normal((S, D)).astype(np.float32))
        sy = jnp.asarray(rng.integers(0, C, size=S).astype(np.int32))
        mask_np = (rng.random(S) > 0.3).astype(np.float32)
        mask = jnp.asarray(mask_np)
        keep = mask_np > 0

        # Query quantized exactly as _prepared_call does (int8, amax/127).
        qn = np.asarray(q)
        qs = np.maximum(np.max(np.abs(qn), axis=1), 1e-30) / 127.0
        q_deq = jnp.asarray(
            np.clip(np.round(qn / qs[:, None]), -127, 127) * qs[:, None]
        )
        for kernel in ("euclidean", "dotproduct"):  # raw-feature kernels
            prep = prepare_support(s, sy, C, kernel=kernel, precision="int4",
                                   support_mask=mask)
            got = np.asarray(nw_fused_log_probs(q, prep, None, C, kernel=kernel))
            s_deq, _ = _unpack_int4(prep)
            oracle = np.asarray(nw_log_probs(
                q_deq, jnp.asarray(s_deq[:S][keep, :D]),
                jnp.asarray(np.asarray(sy)[keep]), C, kernel=kernel))
            assert np.max(np.abs(np.exp(got) - np.exp(oracle))) < 1e-4, kernel

        for kernel in ("euclidean", "cosine"):  # accuracy vs the float bank
            prep = prepare_support(s, sy, C, kernel=kernel, precision="int4",
                                   support_mask=mask)
            got = np.asarray(nw_fused_log_probs(q, prep, None, C, kernel=kernel))
            want = np.asarray(nw_log_probs(q, s, sy, C, kernel=kernel,
                                           support_mask=mask))
            assert np.max(np.abs(np.exp(got) - np.exp(want))) < 0.08, kernel

    def test_int4_windowed_stream_partials(self, rng):
        """C > 128 class windows, forced metadata streaming, and the
        partials variant all ride the unpack path; resident and streamed
        layouts see identical bytes so their outputs must match exactly."""
        from nwhead_tpu.ops.nw import nw_log_probs
        from nwhead_tpu.ops.pallas_nw import (
            nw_fused_from_prepared, prepare_support,
        )

        B, S, D, C = 8, 700, 48, 300
        q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
        s = jnp.asarray(rng.standard_normal((S, D)).astype(np.float32))
        sy = jnp.asarray(rng.integers(0, C, size=S).astype(np.int32))
        want = np.asarray(nw_log_probs(q, s, sy, C))
        prep = prepare_support(s, sy, C, precision="int4", block_s=128)
        assert prep.win is not None
        res = np.asarray(nw_fused_from_prepared(q, prep, C))
        stm = np.asarray(nw_fused_from_prepared(q, prep, C, meta_stream=True))
        np.testing.assert_array_equal(res, stm)
        assert np.max(np.abs(np.exp(res) - np.exp(want))) < 0.03

        m, l, acc = nw_fused_from_prepared(q, prep, C, partials=True)
        fin = np.log(
            np.asarray(acc) / np.maximum(np.asarray(l), 1e-30) + 1e-12
        )
        np.testing.assert_allclose(fin, res, rtol=1e-5, atol=1e-6)

    def test_int4_concat_and_mask_rows(self, rng):
        from nwhead_tpu.ops.nw import nw_log_probs
        from nwhead_tpu.ops.pallas_nw import (
            concat_prepared, mask_prepared_rows, nw_fused_log_probs,
            prepare_for_concat, prepare_support,
        )

        B, S, D, C = 8, 500, 48, 300
        q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
        s = jnp.asarray(rng.standard_normal((S, D)).astype(np.float32))
        sy = jnp.asarray(rng.integers(0, C, size=S).astype(np.int32))
        s2 = jnp.asarray(rng.standard_normal((130, D)).astype(np.float32))
        sy2 = jnp.asarray(rng.integers(0, C, size=130).astype(np.int32))

        pa, oa = prepare_support(s, sy, C, precision="int4", block_s=128,
                                 return_order=True)
        pb, _ = prepare_for_concat(s2, sy2, C, like=pa, precision="int4",
                                   return_order=True)
        cat = concat_prepared([pa, pb], C)
        assert cat.s.dtype == jnp.uint8
        got = np.asarray(nw_fused_log_probs(q, cat, None, C))
        want = np.asarray(nw_log_probs(
            q, jnp.concatenate([s, s2]), jnp.concatenate([sy, sy2]), C))
        assert np.max(np.abs(np.exp(got) - np.exp(want))) < 0.03

        # Tombstone the first 40 input rows through the order map.
        rowmap = oa if oa is not None else np.arange(S)
        prows = np.nonzero(np.isin(rowmap, np.arange(40)))[0]
        pm = mask_prepared_rows(pa, prows)
        gm = np.asarray(nw_fused_log_probs(q, pm, None, C))
        wm = np.asarray(nw_log_probs(q, s[40:], sy[40:], C))
        assert np.max(np.abs(np.exp(gm) - np.exp(wm))) < 0.03

    def test_int4_unpack_impls_identical(self, rng):
        """The two unpack strategies — 'vpu' (per-byte unpack into an int8
        scratch; 'select'/'shift32' are legacy aliases) and 'mxu' (nibble
        dot products recovered from int8 matmuls against the packed bytes
        via the biased-lo affine identity) — read the same bytes through
        exact integer arithmetic and must produce bit-identical outputs
        (scripts/int4_lab.py measures them on chip)."""
        from nwhead_tpu.ops.pallas_nw import (
            nw_fused_from_prepared, prepare_support,
        )

        for kernel, C in (("euclidean", 7), ("cosine", 300)):
            B, S, D = 9, 500, 80
            q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
            s = jnp.asarray(rng.standard_normal((S, D)).astype(np.float32))
            sy = jnp.asarray(rng.integers(0, C, size=S).astype(np.int32))
            prep = prepare_support(s, sy, C, kernel=kernel,
                                   precision="int4", block_s=128)
            outs = {
                impl: np.asarray(nw_fused_from_prepared(
                    q, prep, C, kernel=kernel, int4_impl=impl))
                for impl in ("vpu", "vpu2", "mxu", "mxu2", "select",
                             "shift32")
            }
            np.testing.assert_array_equal(outs["vpu"], outs["mxu"])
            np.testing.assert_array_equal(outs["vpu"], outs["vpu2"])
            np.testing.assert_array_equal(outs["vpu"], outs["mxu2"])
            np.testing.assert_array_equal(outs["vpu"], outs["select"])
            np.testing.assert_array_equal(outs["vpu"], outs["shift32"])
            # ... and under forced metadata streaming.
            for impl in ("vpu", "mxu"):
                stm = np.asarray(nw_fused_from_prepared(
                    q, prep, C, int4_impl=impl, meta_stream=True,
                    kernel=kernel))
                np.testing.assert_array_equal(stm, outs[impl])
            with pytest.raises(ValueError, match="shift8"):
                nw_fused_from_prepared(q, prep, C, kernel=kernel,
                                       int4_impl="shift8")


def test_fused_randomized_property_sweep():
    """Seeded randomized sweep over the fused kernel's whole configuration
    space — kernel variant x odd B/S/D/C x mask on/off x block sizes —
    each sample checked against the naive op. Catches interactions the
    hand-picked cases above can't enumerate (e.g. a mask with an unaligned
    D under a small block_s); deterministic via a fixed seed."""
    from nwhead_tpu.ops.pallas_nw import prepare_support

    sweep_rng = np.random.default_rng(2026)
    for trial in range(12):
        kernel = KERNELS[int(sweep_rng.integers(len(KERNELS)))]
        B = int(sweep_rng.integers(1, 10))
        S = int(sweep_rng.integers(64, 900))
        D = int(sweep_rng.integers(3, 131))
        C = int(sweep_rng.integers(2, 300))
        block_s = int(sweep_rng.choice([64, 128, 256]))
        use_mask = bool(sweep_rng.integers(2))
        kparams = (
            {"logit_scale": jnp.float32(np.log(1 / 0.07))}
            if kernel == "clip" else {}
        )
        q = jnp.asarray(sweep_rng.standard_normal((B, D)).astype(np.float32))
        s = jnp.asarray(sweep_rng.standard_normal((S, D)).astype(np.float32))
        sy = jnp.asarray(sweep_rng.integers(0, C, size=S).astype(np.int32))
        ctx = f"trial={trial} {kernel} B={B} S={S} D={D} C={C} bs={block_s} mask={use_mask}"
        if use_mask:
            keep = int(sweep_rng.integers(1, S))
            mask = jnp.asarray((np.arange(S) < keep).astype(np.float32))
            got = np.asarray(nw_fused_log_probs(
                q, s, sy, C, kernel=kernel, kernel_params=kparams,
                support_mask=mask, block_s=block_s,
            ))
            want = np.asarray(nw_log_probs(
                q, s[:keep], sy[:keep], C, kernel=kernel, kernel_params=kparams
            ))
        else:
            got = np.asarray(nw_fused_log_probs(
                q, s, sy, C, kernel=kernel, kernel_params=kparams,
                block_s=block_s,
            ))
            want = np.asarray(nw_log_probs(
                q, s, sy, C, kernel=kernel, kernel_params=kparams
            ))
            # The prepared serving path must agree on the same sample
            # (clip's logit_scale rides at call time, not prepare time);
            # both one-hot orientations ride the sweep.
            prepared = prepare_support(s, sy, C, kernel=kernel)
            oh_impl = str(sweep_rng.choice(["sub", "lane"]))
            got_prep = np.asarray(nw_fused_log_probs(
                q, prepared, None, C, kernel=kernel,
                kernel_params=kparams or None, oh_impl=oh_impl,
            ))
            np.testing.assert_allclose(got_prep, want, rtol=2e-3, atol=2e-3,
                                       err_msg="prepared " + ctx)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3,
                                   err_msg=ctx)


def test_bigbank_lab_smoke(capsys):
    """scripts/bigbank_lab.py (the million-item single-chip bank demo)
    validates its prepared heads against the exact streaming oracle on the
    CPU smoke shapes — the harness that fires at S=1e6 on the chip."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bigbank_lab",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "bigbank_lab.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main(["--tiny", "--hnsw", "--hnsw_s", "1024"])
    out = capsys.readouterr().out
    assert "FAIL" not in out
    assert out.count("OK ") == 4  # f32/bf16/int8/int4 oracle gates
    assert "tiny smoke OK" in out
    # --hnsw leg: the C++ index must come up over the bank slice and its
    # recall@k against the host brute force must print.
    assert "recall@10" in out
    # --stream_host leg (host-resident bank through nw/streaming.py):
    # the link-constant report must print with a finite rate.
    mod.main(["--stream_host", "4096", "--C", "50"])
    out = capsys.readouterr().out
    assert "[stream_host]" in out and "q/s" in out
    assert "regime boundary" in out


def test_prepared_agg_precision_bf16():
    """agg_precision='bf16' runs the label-aggregation matmul with bf16
    inputs (exact one-hot, p rounded at 2^-9): probabilities must stay
    within ~1e-3 of the f32-agg chain with full top-1 agreement, at every
    bank precision, windowed (C > 128) and not, and for the partials
    variant the sharded path uses."""
    from nwhead_tpu.ops.pallas_nw import (
        nw_fused_from_prepared, prepare_support)

    rng = np.random.default_rng(23)
    B, S, D = 40, 700, 64
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((S, D)).astype(np.float32))
    for C in (90, 300):  # un-windowed and windowed aggregation
        sy = jnp.asarray(rng.integers(0, C, size=S).astype(np.int32))
        for prec in ("f32", "bf16", "int8", "int4"):
            prep = prepare_support(s, sy, C, precision=prec)
            ref = np.asarray(nw_fused_from_prepared(
                q, prep, C, agg_precision="f32"))
            got = np.asarray(nw_fused_from_prepared(
                q, prep, C, agg_precision="bf16"))
            perr = np.abs(np.exp(got) - np.exp(ref)).max()
            assert perr < 3e-3, (C, prec, perr)
            # argmax must agree except on genuine near-ties (random banks
            # put many classes within the bf16 rounding band): require
            # agreement wherever the f32 top-2 prob gap exceeds it.
            pr = np.exp(ref)
            top2 = np.sort(pr, axis=1)[:, -2:]
            decisive = (top2[:, 1] - top2[:, 0]) > 3e-3
            agree = ref.argmax(1) == got.argmax(1)
            assert agree[decisive].all(), (C, prec)

        prep = prepare_support(s, sy, C)
        m_f, l_f, acc_f = nw_fused_from_prepared(
            q, prep, C, partials=True, agg_precision="f32")
        m_b, l_b, acc_b = nw_fused_from_prepared(
            q, prep, C, partials=True, agg_precision="bf16")
        np.testing.assert_array_equal(np.asarray(m_f), np.asarray(m_b))
        np.testing.assert_allclose(
            np.asarray(acc_b), np.asarray(acc_f), rtol=4e-3, atol=4e-3)
        np.testing.assert_allclose(
            np.asarray(l_b), np.asarray(l_f), rtol=4e-3)


def test_prepared_oh_impl_lane():
    """oh_impl='lane' builds the per-tile one-hot transposed (classes in
    sublanes) straight from the lane-major labels — same data, same
    arithmetic up to MXU contraction orientation. Probabilities must match
    'sub' tightly at every precision, windowed (C > 128) and not, with
    masked rows, under forced metadata streaming, and for the partials
    variant the sharded path uses."""
    from nwhead_tpu.ops.pallas_nw import (
        nw_fused_from_prepared, prepare_support)

    rng = np.random.default_rng(31)
    B, S, D = 24, 700, 64
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((S, D)).astype(np.float32))
    for C in (90, 300):  # un-windowed and windowed aggregation
        sy = jnp.asarray(rng.integers(0, C, size=S).astype(np.int32))
        mask = jnp.asarray((np.arange(S) < S - 37).astype(np.float32))
        for prec in ("f32", "bf16", "int8", "int4"):
            prep = prepare_support(
                s, sy, C, precision=prec, support_mask=mask, block_s=256)
            for stream in (False, True):
                ref = np.asarray(nw_fused_from_prepared(
                    q, prep, C, oh_impl="sub", meta_stream=stream))
                got = np.asarray(nw_fused_from_prepared(
                    q, prep, C, oh_impl="lane", meta_stream=stream))
                perr = np.abs(np.exp(got) - np.exp(ref)).max()
                assert perr < 1e-5, (C, prec, stream, perr)
                assert (ref.argmax(1) == got.argmax(1)).all(), (
                    C, prec, stream)

        prep = prepare_support(s, sy, C, block_s=256)
        m_s, l_s, acc_s = nw_fused_from_prepared(
            q, prep, C, partials=True, oh_impl="sub")
        m_l, l_l, acc_l = nw_fused_from_prepared(
            q, prep, C, partials=True, oh_impl="lane")
        np.testing.assert_array_equal(np.asarray(m_s), np.asarray(m_l))
        np.testing.assert_allclose(
            np.asarray(acc_l), np.asarray(acc_s), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(l_l), np.asarray(l_s), rtol=1e-5)

    # Raw-array path: prepared-only option must be rejected loudly.
    sy = jnp.asarray(rng.integers(0, 90, size=S).astype(np.int32))
    with pytest.raises(ValueError, match="oh_impl"):
        nw_fused_log_probs(q, s, sy, 90, oh_impl="lane")


def test_windowed_prepared_aggregation():
    """Class-windowed prepared banks (C > 128): rows are sorted by class at
    prepare time and the kernel aggregates into a narrow dynamic window —
    output must equal the naive op on the ORIGINAL (unsorted) bank for
    every precision, with masks, and under label skew; C <= 128 and
    window=False must not build a window at all."""
    from nwhead_tpu.ops.pallas_nw import nw_fused_log_probs, prepare_support

    rng = np.random.default_rng(11)
    B, S, D, C = 5, 700, 64, 500
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((S, D)).astype(np.float32))
    sy = jnp.asarray(rng.integers(0, C, size=S).astype(np.int32))

    want = np.asarray(nw_log_probs(q, s, sy, C))
    prep = prepare_support(s, sy, C, block_s=256)
    assert prep.win is not None, "C=500 host prep must window"
    assert prep.win.shape[1] * 128 < 512  # narrower than c_pad
    got = np.asarray(nw_fused_log_probs(q, prep, None, C))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    # Lossy precisions ride the same window machinery.
    for prec in ("bf16", "int8", "int4"):
        prep_l = prepare_support(s, sy, C, block_s=256, precision=prec)
        assert prep_l.win is not None
        got_l = np.asarray(nw_fused_log_probs(q, prep_l, None, C))
        perr = np.max(np.abs(np.exp(got_l) - np.exp(want)))
        assert perr < 0.06, (prec, perr)

    # Masked rows sort to the end and never leak into any window.
    keep = 450
    mask = jnp.asarray((np.arange(S) < keep).astype(np.float32))
    # Poison the masked rows' labels toward a class far from the rest.
    sy_poison = np.asarray(sy).copy()
    sy_poison[keep:] = C - 1
    prep_m = prepare_support(
        s, jnp.asarray(sy_poison), C, block_s=256, support_mask=mask
    )
    want_m = np.asarray(
        nw_log_probs(q, s[:keep], jnp.asarray(sy_poison[:keep]), C)
    )
    got_m = np.asarray(nw_fused_log_probs(q, prep_m, None, C))
    np.testing.assert_allclose(got_m, want_m, rtol=2e-3, atol=2e-3)

    # Label skew: 90% of rows in one class, the rest spread — windows stay
    # correct when a class spans multiple tiles.
    sy_skew = np.full(S, 7, np.int32)
    sy_skew[: S // 10] = rng.integers(0, C, size=S // 10)
    sy_skew = jnp.asarray(sy_skew)
    prep_k = prepare_support(s, sy_skew, C, block_s=256)
    got_k = np.asarray(nw_fused_log_probs(q, prep_k, None, C))
    want_k = np.asarray(nw_log_probs(q, s, sy_skew, C))
    np.testing.assert_allclose(got_k, want_k, rtol=2e-3, atol=2e-3)

    # No window when it cannot help / is disabled.
    assert prepare_support(s, sy % 100, 100).win is None
    assert prepare_support(s, sy, C, window=False).win is None


def test_window_keep_mode():
    """window='keep': per-tile class windows computed WITHOUT re-sorting.

    A caller-provided class-grouped order (the IVF dominant-class cluster
    sort) must window and stay exact vs the naive op; a hostile shuffled
    order must auto-drop to the plain path (win None) and stay exact; and
    return_order must report identity (None) since no permutation happened.
    """
    from nwhead_tpu.ops.pallas_nw import nw_fused_log_probs, prepare_support

    rng = np.random.default_rng(23)
    B, S, D, C = 5, 700, 64, 500
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    s_np = rng.standard_normal((S, D)).astype(np.float32)
    sy_np = rng.integers(0, C, size=S).astype(np.int32)

    # Class-grouped order, built by the caller (not by prepare_support).
    grp = np.argsort(sy_np, kind="stable")
    s_g = jnp.asarray(s_np[grp])
    sy_g = jnp.asarray(sy_np[grp])
    want = np.asarray(nw_log_probs(q, s_g, sy_g, C))

    prep, order = prepare_support(
        s_g, sy_g, C, block_s=256, window="keep", return_order=True
    )
    assert prep.win is not None, "class-grouped order must keep windows"
    assert prep.win.shape[1] * 128 < 512
    assert order is None, "keep mode must not permute rows"
    got = np.asarray(nw_fused_log_probs(q, prep, None, C))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    # Same rows, masked tail: masked labels never widen a kept window.
    keep = 600
    mask = jnp.asarray((np.arange(S) < keep).astype(np.float32))
    sy_p = np.asarray(sy_g).copy()
    sy_p[keep:] = 0  # poison far from the tail tiles' span
    prep_m = prepare_support(
        s_g, jnp.asarray(sy_p), C, block_s=256, window="keep",
        support_mask=mask,
    )
    want_m = np.asarray(
        nw_log_probs(q, s_g[:keep], jnp.asarray(sy_p[:keep]), C)
    )
    got_m = np.asarray(nw_fused_log_probs(q, prep_m, None, C))
    np.testing.assert_allclose(got_m, want_m, rtol=2e-3, atol=2e-3)

    # Hostile order: a tile spanning the full class range drops windows
    # everywhere — but the output is still exact (plain path).
    s_h = jnp.asarray(s_np)
    sy_h = jnp.asarray(sy_np)
    prep_h = prepare_support(s_h, sy_h, C, block_s=256, window="keep")
    assert prep_h.win is None
    want_h = np.asarray(nw_log_probs(q, s_h, sy_h, C))
    got_h = np.asarray(nw_fused_log_probs(q, prep_h, None, C))
    np.testing.assert_allclose(got_h, want_h, rtol=2e-3, atol=2e-3)


def test_bigbank_lab_giant_ivf_smoke(capsys):
    """--giant --giant_ivf: chunked IVF build (prepare_support_ivf per
    chunk + concat_ivf) must pass both the centroid-query gate and the
    routed skew-query gate on the CPU smoke shapes."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bigbank_lab_g",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "bigbank_lab.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main(["--tiny", "--giant", "8192", "--giant_ivf"])
    out = capsys.readouterr().out
    assert "FAIL" not in out
    assert "routed (n_probe=4) skew-query top-1: 1.000" in out


def test_serving_block_s_scale_aware():
    """The scale-aware default tile size (round-5 measured decision):
    1024 below the DMA-bound threshold, 2048 past it, 4096 past 4M rows
    (same-session 8M A/B: B=64 0.845 -> 0.975 of stream); prepare_support
    picks it up when block_s is omitted."""
    from nwhead_tpu.ops.pallas_nw import (
        _BLOCK_S_GIANT_ROWS, _BLOCK_S_HUGE_ROWS, _serving_block_s,
        prepare_support)

    assert _serving_block_s(5994) == 1024
    assert _serving_block_s(_BLOCK_S_GIANT_ROWS - 1) == 1024
    assert _serving_block_s(_BLOCK_S_GIANT_ROWS) == 2048
    assert _serving_block_s(_BLOCK_S_HUGE_ROWS - 1) == 2048
    assert _serving_block_s(_BLOCK_S_HUGE_ROWS) == 4096
    assert _serving_block_s(8_000_000) == 4096
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.standard_normal((3000, 32)).astype(np.float32))
    sy = jnp.asarray(rng.integers(0, 7, 3000).astype(np.int32))
    prep = prepare_support(s, sy, 7)
    assert prep.lane.shape[1] * 128 == 1024  # small bank keeps 1024
