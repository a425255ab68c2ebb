"""meta_stream: the prepared serving kernel's giant-bank metadata path.

By default the per-row metadata (l2 self-norms, int8 row scales, and both
compact label layouts) rides whole-array in VMEM — zero per-tile DMA
issues, but the sublane-major label copy lane-pads nchunk -> 128 so the
resident footprint scales 16x with bank rows and a multi-million-row bank
cannot compile. ``meta_stream=True`` moves the metadata to HBM and
streams one tile of each array per bank tile through the same double
buffer as the bank rows. Values must be IDENTICAL — it's the same
arithmetic on the same data, only the residency changes.

The switch auto-selects past ``_META_STREAM_BYTES`` resident; these tests
force it on small banks (interpret mode) against the default layout.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nwhead_tpu.ops.pallas_nw import (
    nw_fused_from_prepared,
    prepare_support,
)

BS = 128


def _mk(S, D, C, seed=0, B=8):
    rng = np.random.default_rng(seed)
    f = jnp.asarray(rng.standard_normal((S, D)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, C, size=S).astype(np.int32))
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    return f, y, q


@pytest.mark.parametrize("precision", ["f32", "bf16", "int8"])
@pytest.mark.parametrize(
    "C,kernel",
    [
        (40, "euclidean"),       # l2, plain agg
        (300, "euclidean"),      # l2 + class windows
        (40, "dotproduct"),      # dot, label-sentinel masking path
        (300, "cosine"),         # dot + class windows
    ],
)
def test_meta_stream_identical(precision, C, kernel):
    f, y, q = _mk(640, 64, C, seed=C + len(kernel) + ord(precision[0]))
    mask = np.ones(640, np.float32)
    mask[17] = 0.0  # one tombstoned row exercises the sentinel paths
    prep = prepare_support(
        f, y, C, kernel=kernel, precision=precision, block_s=BS,
        support_mask=jnp.asarray(mask),
    )
    base = np.asarray(
        nw_fused_from_prepared(q, prep, C, kernel=kernel, meta_stream=False)
    )
    stream = np.asarray(
        nw_fused_from_prepared(q, prep, C, kernel=kernel, meta_stream=True)
    )
    # Same ops on the same data — bitwise equal, any precision.
    np.testing.assert_array_equal(stream, base)


@pytest.mark.parametrize("precision", ["f32", "int8"])
def test_meta_stream_partials_identical(precision):
    f, y, q = _mk(512, 32, 24, seed=3)
    prep = prepare_support(
        f, y, 24, kernel="euclidean", precision=precision, block_s=BS
    )
    base = nw_fused_from_prepared(
        q, prep, 24, partials=True, meta_stream=False
    )
    stream = nw_fused_from_prepared(
        q, prep, 24, partials=True, meta_stream=True
    )
    for a, b in zip(stream, base):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_meta_stream_autoselect_threshold(monkeypatch):
    """The size heuristic flips the switch without changing values."""
    import nwhead_tpu.ops.pallas_nw as pnw

    f, y, q = _mk(512, 32, 12, seed=5)
    prep = prepare_support(f, y, 12, block_s=BS)
    base = np.asarray(nw_fused_from_prepared(q, prep, 12))
    # Force the auto path into streaming mode by shrinking the threshold.
    monkeypatch.setattr(pnw, "_META_STREAM_BYTES", 0)
    auto = np.asarray(nw_fused_from_prepared(q, prep, 12))
    np.testing.assert_array_equal(auto, base)
