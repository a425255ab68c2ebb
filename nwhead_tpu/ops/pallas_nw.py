"""Fused Pallas TPU kernel for the NW head: distance -> online softmax ->
label aggregation in one pass.

This is the TPU-native replacement for the reference's materialize-then-
softmax chain (``torch.cdist -> F.softmax -> torch.bmm``, ``nw.py:283-287``)
and its legacy streaming variant (``legacy/model/net.py:53-72``): a
flash-attention-style kernel that tiles the support axis, keeps running
(max m, normalizer l, weighted label-sum acc) in VMEM, and never writes the
``(B, S)`` score matrix to HBM.

Label layout (round-2 redesign): support labels ride as two TINY compact
arrays instead of a (S, 128) broadcast —
  * lane-major   ``(n_tiles, block_s/128, 128)``: masks score columns,
  * sublane-major ``(n_tiles, 128, block_s/128)``: builds the per-tile
    one-hot in VMEM without any cross-lane relayout (Mosaic can't transpose
    (1,N)->(N,1) cheaply).
Label HBM traffic is ~S*8 bytes total (vs S*256 in round 1), and the -1
sentinel doubles as the validity mask.

Serving fast path: ``prepare_support`` pads + normalizes the bank, packs
labels, and precomputes the bank self-norms ONCE; per-predict cost is then
exactly one streamed pass over the bank (the round-1 wrapper re-padded and
re-broadcast ~2x the bank bytes per call before the kernel even started).
The prepared path is inference-only; the differentiable path (custom VJP,
training) recomputes norms in-kernel from the raw features.

Kernel variants (resolved in the wrapper, so the kernel body has only two
static modes):
  * ``euclidean``              -> mode 'l2' on raw features
  * ``hypersphere_euclidean``  -> mode 'l2' on L2-normalized features
  * ``cosine``                 -> mode 'dot' on L2-normalized features
  * ``dotproduct``             -> mode 'dot' on raw features
  * ``clip``                   -> mode 'dot' on normalized features, scaled
                                  by exp(logit_scale) (runtime scalar)

Gradients: training differentiates through both query and support features
(the reference trains the joint graph, ``nw.py:182-184``). The custom VJP
backward is two more Pallas kernels (dq and ds) that recompute tile scores
from the saved softmax statistics (m, l) — one flash-style pass each.
Shapes are padded to the tile sizes internally; padding is masked to
score = -inf, exactly equivalent to a smaller support.

Measured on TPU v5e (B=64, S=5994, D=512, C=200; STREAM-calibrated HBM
bandwidth ~690 GB/s): the remaining gap to the pure-DMA floor is per-tile
MXU pass latency (both matmuls are batch-independent below M=128) plus the
online-softmax VPU chain — see scripts/kernel_lab.py for the decomposition.
"""

from __future__ import annotations

import functools
import warnings
from typing import Any, Dict, NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nwhead_tpu.ops.nw import LOG_FLOOR

_NEG_INF = float(jnp.finfo(jnp.float32).min)
_MASK_S2 = 1e30  # self-norm sentinel for masked rows (prepared l2 path)
DEFAULT_BLOCK_S = 2048
_SINGLE_TILE_BUDGET = 14_000_000  # bytes of (bank tile + one-hot scratch)
# v5e has 128 MiB VMEM; the compiler's default scoped limit is lower. 100
# MiB gives the whole-batch query tile headroom: the per-tile f32 score
# chain allocates O(block_b * block_s) stack copies, and block_b=512 at
# block_s=1024 measured 66.5 MB scoped — over the old 64 MiB limit.
_VMEM_LIMIT = 100 * 1024 * 1024
# Prepared serving kernel: row metadata (self-norms/scales/labels) rides
# whole-array in VMEM while it fits (one leading-dim slice per tile, zero
# DMA-issue overhead), but its footprint scales with S — the sublane-major
# label copy lane-pads nchunk -> 128 in VMEM (16x at block_s=1024; the 4M
# probe's compile error shows the f32[n_tiles,128,8] input window
# allocated as n_tiles*128*128*4 bytes), so ~76 MB of metadata parks in
# VMEM at 1M rows. Measured on chip: resident COMPILES at 1M (and is
# 5-13% faster than streaming — meta_lab), FAILS at 2M (scoped 123 MB >
# the 100 MB limit). Past this threshold the kernel streams metadata
# tiles HBM->VMEM through the same double buffer as the bank rows
# (sub lane-padded in HBM: +64 KB/tile of traffic, 3-4 extra tiny DMA
# issues per tile) — mandatory for multi-million-row banks.
_META_STREAM_BYTES = 80 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _auto_block_s(S: int, D: int, itemsize: int, c_pad: int) -> int:
    """Whole (padded) bank as ONE tile when bank + one-hot scratch fit a
    conservative VMEM budget (no pipelining overhead — measured fastest),
    else the empirically best multi-tile size (2048)."""
    s_pad = _round_up(S, 128)
    if s_pad * (D * itemsize + c_pad * 4) <= _SINGLE_TILE_BUDGET:
        return s_pad
    return DEFAULT_BLOCK_S


# Scale-aware serving tile size (round-5; scripts/bigbank_lab.py
# --giant_block_s, scripts/int4_lab.py --block_s). The per-tile DMA
# issue cost is ~flat regardless of transfer size (round-4 skip probes:
# int4's 256 KB and int8's 512 KB tiles cost the same), so once the bank
# is DMA-bound, fewer/larger tiles win. Measured on chip: 8M int8 read
# 8.19 ms at 1024-row tiles vs 6.86 ms at 2048; 1M int8 B=64 1.011 ->
# 0.853 ms (1.19x), B=256 2.393 -> 2.239, int4 wins the same way
# (round-5 sweep). At CUB scale the round-3 512/1024/2048 sweep was
# flat, and 2048 halves the block_b VMEM cap (512*1024 stack budget ->
# whole-batch tiles stop at 256 queries), which costs ~2.5% at B >= 512
# — so 1024 stays the default below the threshold. Past 4M rows a
# 4096-row tile wins again (same-session 8M int8 A/B on chip: B=64
# 6.872 -> 5.957 ms, 0.845 -> 0.975 of measured stream; B=256 -2.7% —
# the halved whole-batch cap makes 256-query calls stream the bank
# twice, but that regime is VPU-bound and the second stream hides).
_BLOCK_S_GIANT = 2048
_BLOCK_S_GIANT_ROWS = 262_144
_BLOCK_S_HUGE = 4096
_BLOCK_S_HUGE_ROWS = 4_194_304


def _serving_block_s(S: int) -> int:
    """Default prepared-bank tile size: 1024 rows (the small/medium-bank
    optimum — DMA/compute overlap with a small pipeline tail) until the
    DMA-bound threshold, 2048 past it, 4096 past 4M rows (per-tile issue
    cost amortization; see _BLOCK_S_GIANT comment)."""
    if S >= _BLOCK_S_HUGE_ROWS:
        return _BLOCK_S_HUGE
    return _BLOCK_S_GIANT if S >= _BLOCK_S_GIANT_ROWS else 1024


def _default_block_b(B: int, n_classes: int, block_s: int = 0) -> int:
    """Whole batch as ONE query tile (up to a VMEM-budgeted cap): the bank
    then streams ONCE per call regardless of batch size and the per-tile
    one-hot is built once, not once per 128-query tile (B=256 f32
    previously paid 2x the bank bytes — blockb_lab: 1.85x at the 1M bank).
    Two budgets bound the cap: the (block_b, c_pad) f32 accumulator (~8 MB
    at huge C), and — when the support tile size is known — the per-tile
    f32 score-chain stack, which scales with block_b * block_s (512 x 1024
    measured 66.5 MB scoped vmem against the 100 MiB limit; hold the
    product at or under that point). Shared by nw_fused_from_prepared and
    nw_fused_partials so the single-device and sharded paths agree."""
    c_pad = _round_up(n_classes, 128)
    cap = max(128, min(512, (8 << 20) // (c_pad * 4) // 8 * 8))
    if block_s:
        cap = min(cap, max(128, (512 * 1024 // block_s) // 8 * 8))
    return min(cap, _round_up(B, 8))


def _l2_normalize(x, axis=-1, eps=1e-12):
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def _pack_labels(
    sy: jnp.ndarray, mask: jnp.ndarray, s_pad: int, block_s: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Labels (+ -1 for masked/padding) -> compact lane-major
    (n_tiles, nchunk, 128) and sublane-major (n_tiles, 128, nchunk) f32."""
    S = sy.shape[0]
    nchunk = block_s // 128
    sy_p = jnp.pad(sy.astype(jnp.int32), (0, s_pad - S), constant_values=-1)
    mask_p = jnp.pad(mask.astype(jnp.float32), (0, s_pad - S))
    sy_p = jnp.where(mask_p > 0, sy_p, -1).astype(jnp.float32)
    lane = sy_p.reshape(s_pad // block_s, nchunk, 128)
    sub = jnp.transpose(lane, (0, 2, 1))
    return lane, sub


class PreparedSupport(NamedTuple):
    """A support bank prepared once for repeated fused inference: padded
    (and kernel-normalized) features, precomputed self-norms, compact
    labels. Build with ``prepare_support``; statics (tile size, mode) are
    re-derived from shapes + the kernel name at call time.

    ``precision='int8'`` quantizes the bank symmetrically per row
    (s ≈ s_int8 * sscale_row): 4x less bank traffic than f32; the kernel
    runs the distance dot on the int8 MXU path and dequantizes scores with
    the per-row scales (``sscale``, stored lane-major compact like s2c).

    ``precision='int4'`` halves that again: two 4-bit codes per byte
    (feature pairs ``(j, j + D_pad/2)`` share a byte so the in-kernel
    unpack is two static lane-half writes), stored as **uint8** — the
    dtype is the int4 marker. 8x less bank DMA than f32 and 2x the rows
    per chip vs int8; the kernel unpacks each streamed tile to int8 on
    the VPU and runs the same int8 MXU dot/dequant chain. Accuracy note:
    int4 suits the normalized-geometry kernels (euclidean/cosine/clip —
    bounded per-element error); raw ``dotproduct`` amplifies 4-bit
    feature noise through unbounded score magnitudes — prefer int8
    there (tests/test_pallas_nw.py TestInt4Bank)."""

    s: jnp.ndarray  # (S_pad, D_pad) f32/bf16/int8, or (S_pad, D_pad/2)
    #                 uint8 nibble-packed int4; normalized per kernel
    s2c: Optional[jnp.ndarray]  # (n_tiles, nchunk, 128) f32, l2 modes only
    lane: jnp.ndarray  # (n_tiles, nchunk, 128) f32 labels, -1 = invalid
    sub: jnp.ndarray  # (n_tiles, 128, nchunk) f32
    sscale: Optional[jnp.ndarray] = None  # (n_tiles, nchunk, 128) f32, int8 only
    # Class-windowed aggregation (C > 128 host-side preps): rows are SORTED
    # by class so each tile's labels span a narrow window; win[j, 0] is the
    # tile's 128-aligned window start and the STATIC window width rides in
    # the array's shape (W = win.shape[1] * 128 — a plain int field would
    # become a traced leaf when the prepared bank rides as a jit argument).
    # The kernel then builds a (block_s, W) one-hot + (TB, W) label matmul
    # instead of (block_s, c_pad): the aggregation term is the dominant
    # non-DMA cost at large C (measured S=1e6/C=1000 int8: 0.5 of 1.48 ms).
    win: Optional[jnp.ndarray] = None  # (n_tiles, W//128) int32


@jax.jit
def _int4_pack(sf):
    """Fused int4 quantize + nibble pack + dequantized self-norms.

    ``sf`` is the (S_pad, d_pad) f32 bank with d_pad % 256 == 0. Nibble
    packing: byte[i, j] = (code[i, j + half] << 4) | (code[i, j] + 8) —
    feature PAIRS (j, j + d_pad/2) share a byte, so the in-kernel unpack
    is two static lane-half writes (no interleave, which Mosaic relayouts
    would make expensive). The dot is permutation-invariant in the
    feature dim, and the query is padded/quantized to the same d_pad
    order. Stored as uint8 — the dtype IS the int4 marker (int8 = plain
    int8 banks); the serving path bitcasts to int8 before the kernel.

    The LO nibble is stored BIASED (+8, so it occupies [1, 15] unsigned)
    rather than two's-complement. That makes the signed byte value an
    exact affine function of the two codes — b = 16*hi + (lo + 8) — which
    is what lets the 'mxu' unpack recover both nibbles' dot products from
    matmuls against the PACKED bytes (see _nw_prepared_kernel), and it
    turns the VPU unpack's lo fixup into a single subtract (no
    compare/select chain). All nibble math stays in the int8 domain
    (1-byte temps; int8 shifts wrap to exactly the intended bit
    patterns)."""
    amax = jnp.max(jnp.abs(sf), axis=1)
    scale = jnp.where(amax > 0, amax / 7.0, 1.0)
    v = jnp.clip(jnp.round(sf / scale[:, None]), -7, 7).astype(jnp.int8)
    s2 = jnp.sum(v.astype(jnp.float32) ** 2, axis=1) * scale * scale
    half = sf.shape[1] // 2
    packed = jax.lax.bitcast_convert_type(
        (v[:, :half] + 8) | (v[:, half:] << 4), jnp.uint8
    )
    return packed, scale, s2


def prepare_support(
    sfeat: jnp.ndarray,
    sy: jnp.ndarray,
    n_classes: int,
    *,
    kernel: str = "euclidean",
    support_mask: Optional[jnp.ndarray] = None,
    precision: str = "f32",
    block_s: Optional[int] = None,
    window: bool = True,
    return_order: bool = False,
) -> PreparedSupport:
    """Pad + normalize + pack a support bank for the fused serving path.

    ``window=True`` (default; host-side preps with C > 128 only): sort the
    bank by class so each tile's labels span a narrow 128-aligned class
    window, shrinking the per-tile one-hot/label-matmul from O(block_s *
    c_pad) to O(block_s * W). Row order inside a prepared bank is opaque
    (the head's output is order-independent); pass ``window=False`` where
    callers slice prepared fields positionally across shards (the sharded
    bank concatenates per-shard preps, whose static widths could differ).
    ``window="keep"`` computes the per-tile windows WITHOUT re-sorting —
    for callers whose row order already groups classes (the IVF
    cluster-sort orders clusters by dominant class); if any tile's span
    reaches full width the windows are dropped automatically (the
    ``W < c_pad`` check), so a hostile order only costs the plain path.

    ``return_order=True``: also return the host-side row permutation as an
    int64 numpy array (``order[j]`` = input row index stored at prepared
    row ``j``), or ``None`` when rows kept input order — callers that
    tombstone rows later (``mask_prepared_rows``) need input-row ->
    prepared-row positions.
    """
    if precision not in ("f32", "bf16", "int8", "int4"):
        raise ValueError(f"unknown precision {precision!r}")
    if precision == "int4" and kernel == "dotproduct":
        # Documented accuracy caveat (tests/test_pallas_nw.py TestInt4Bank):
        # raw dot scores have unbounded magnitude, so 4-bit feature noise
        # is amplified straight into the softmax. The normalized-geometry
        # kernels (euclidean/cosine/clip) bound the per-element error.
        warnings.warn(
            "int4 serving banks amplify quantization noise under the raw "
            "dotproduct kernel; prefer precision='int8' there (euclidean/"
            "cosine/clip are fine at int4).",
            stacklevel=2,
        )
    if support_mask is None:
        support_mask = jnp.ones(sfeat.shape[0], dtype=jnp.float32)
    sy_np = mask_np = order = None
    windowed = (
        window
        and n_classes > 128
        and not isinstance(sy, jax.core.Tracer)
        and not isinstance(support_mask, jax.core.Tracer)
    )
    if windowed:
        sy_np = np.asarray(sy)
        mask_np = np.asarray(support_mask)
        if window != "keep":
            # Stable sort by class, masked rows last (their label is a
            # sentinel anyway); applied to features/labels/mask together.
            order = np.argsort(
                np.where(mask_np > 0, sy_np, n_classes), kind="stable"
            )
            sfeat = jnp.asarray(sfeat)[order]
            sy = jnp.asarray(sy)[order]
            support_mask = jnp.asarray(support_mask)[order]
            sy_np, mask_np = sy_np[order], mask_np[order]
    if not isinstance(sy, jax.core.Tracer):  # host-side prep: validate labels
        mx = int(jnp.max(sy))
        if mx >= n_classes:
            raise ValueError(f"label {mx} out of range for n_classes={n_classes}")
    if precision == "bf16":
        sfeat = sfeat.astype(jnp.bfloat16)
    mode, _, _, sn = _resolve_mode(kernel, {"logit_scale": jnp.float32(0.0)},
                                   sfeat[:1], sfeat)
    S, D = sn.shape
    if block_s is None:
        block_s = _serving_block_s(S)
    # TPU tiles are 128 lanes wide — a sub-lane block_s can never be
    # valid (it would make _pack_labels' chunk count zero); round it up.
    block_s = min(_round_up(block_s, 128), _round_up(S, 128))
    s_pad = _round_up(S, block_s)
    # int4 packs feature pairs (j, j + d_pad/2) into one byte, so each
    # unpacked half must stay 128-lane aligned: pad D to 256 there.
    d_pad = _round_up(D, 256 if precision == "int4" else 128)
    s_p = jnp.pad(sn, ((0, s_pad - S), (0, d_pad - D)))
    nchunk = block_s // 128

    # Masked rows may hold untrusted content — that is what a mask means
    # (e.g. masking out corrupted rows). Zero their features here so the
    # score dot stays finite: a NaN/Inf in a masked row would otherwise
    # poison the running softmax max for every query (the l2 serving
    # kernel has no per-tile mask compare — validity rides the folded
    # self-norms and the label sentinel). Also keeps the int8 per-row
    # amax/scale finite.
    mrow = jnp.pad(support_mask.astype(jnp.float32), (0, s_pad - S))
    # where, not multiply: NaN * 0 is still NaN.
    s_p = jnp.where(mrow[:, None] > 0, s_p, jnp.zeros((), s_p.dtype))

    sscale = None
    s2_quant = None  # self-norms of the dequantized bank (quant precisions)
    if precision == "int8":
        # Symmetric per-row quantization; the bank is stored int8, scores
        # dequantize inside the kernel: s_row ≈ s_q * sscale_row.
        sf = s_p.astype(jnp.float32)
        amax = jnp.max(jnp.abs(sf), axis=1)  # (s_pad,)
        scale = jnp.where(amax > 0, amax / 127.0, 1.0)
        s_q = jnp.clip(jnp.round(sf / scale[:, None]), -127, 127)
        s_p = s_q.astype(jnp.int8)
        s2_quant = jnp.sum((s_q * scale[:, None]) ** 2, axis=1)
        sscale = scale.reshape(s_pad // block_s, nchunk, 128)
    elif precision == "int4":
        # One fused jit call: quantize -> nibble-pack -> dequantized
        # self-norms. The eager-op version materialized several full-bank
        # f32/int32 temporaries — at S=1e6 (2 GB f32) that OOM'd a chip
        # already holding the other precisions' banks; fused, the peak is
        # the f32 input + the packed output.
        s_p, scale, s2_quant = _int4_pack(s_p.astype(jnp.float32))
        sscale = scale.reshape(s_pad // block_s, nchunk, 128)

    s2c = None
    if mode == "l2":
        if s2_quant is not None:
            s2 = s2_quant
        else:
            s2 = jnp.sum(s_p.astype(jnp.float32) ** 2, axis=1)
        # Validity folded into the self-norms: masked/padding rows get
        # s2 = _MASK_S2, so their score is ~-1e15 and exp underflows to
        # exactly 0 whenever any valid row exists (and an all-invalid
        # support still collapses to the log-floor). The serving kernel
        # then skips the per-tile mask compare/select entirely for l2.
        s2 = jnp.where(mrow > 0, s2, _MASK_S2)
        s2c = s2.reshape(s_pad // block_s, nchunk, 128)
    lane, sub = _pack_labels(jnp.asarray(sy), support_mask, s_pad, block_s)

    win = None
    if windowed:
        n_tiles = s_pad // block_s
        c_pad = _round_up(n_classes, 128)
        lab = np.full(s_pad, -1, np.int64)
        lab[:S] = np.where(mask_np > 0, sy_np, -1)
        labt = lab.reshape(n_tiles, block_s)
        valid = labt >= 0
        any_valid = valid.any(axis=1)
        c_lo = np.where(
            any_valid, np.where(valid, labt, n_classes).min(axis=1), 0
        )
        c_hi = np.where(any_valid, np.where(valid, labt, -1).max(axis=1), 0)
        w = (c_lo // 128) * 128
        W = _round_up(max(int(np.max(c_hi - w + 1)), 1), 128)
        if W < c_pad:  # a full-width window would just be the plain path
            # Clamp so w + W never crosses c_pad ([c_lo, c_hi] stays
            # covered: w only ever moves DOWN). Stored as BLOCK indices —
            # the kernel multiplies by 128 in-index so Mosaic can
            # statically prove the dynamic lane offset's alignment.
            w = np.minimum(w, c_pad - W)
            win = jnp.asarray(
                np.broadcast_to(
                    (w // 128).astype(np.int32)[:, None],
                    (n_tiles, W // 128),
                ).copy()
            )
    prep = PreparedSupport(
        s=s_p, s2c=s2c, lane=lane, sub=sub, sscale=sscale, win=win
    )
    if return_order:
        return prep, (None if order is None else order.astype(np.int64))
    return prep


def prepare_for_concat(
    sfeat: jnp.ndarray,
    sy: jnp.ndarray,
    n_classes: int,
    like: PreparedSupport,
    *,
    kernel: str = "euclidean",
    precision: str = "f32",
    support_mask: Optional[jnp.ndarray] = None,
    return_order: bool = False,
) -> PreparedSupport:
    """Prepare rows tile-compatible with an existing prepared bank.

    ``prepare_support`` shrinks the tile size to the (rounded) row count
    for small inputs, which would make the result un-concatenable with a
    bank built at a larger tile; this pads the new rows (masked, so they
    are invisible to the head) up to a multiple of ``like``'s tile size
    first. Callers pass the same ``kernel``/``precision`` the existing
    bank was built with — ``concat_prepared`` validates what it can
    (dtype, widths), the kernel name it cannot."""
    block_s = like.lane.shape[1] * 128
    n = int(sfeat.shape[0])
    if n == 0:
        raise ValueError("prepare_for_concat needs at least one row")
    if support_mask is None:
        support_mask = jnp.ones(n, dtype=jnp.float32)
    pad = _round_up(n, block_s) - n
    if pad:
        sfeat = jnp.pad(jnp.asarray(sfeat), ((0, pad), (0, 0)))
        sy = jnp.pad(jnp.asarray(sy), (0, pad))
        support_mask = jnp.pad(jnp.asarray(support_mask), (0, pad))
    return prepare_support(
        sfeat, sy, n_classes, kernel=kernel,
        support_mask=support_mask, precision=precision, block_s=block_s,
        return_order=return_order,
    )


def concat_prepared(
    preps: Tuple[PreparedSupport, ...], n_classes: int
) -> PreparedSupport:
    """Concatenate prepared banks into one larger prepared bank, O(bytes).

    Every per-tile field (self-norms, compact labels, quant scales, class
    windows) is tile-local, so banks prepared with the same kernel,
    precision, feature width, and tile size concatenate by stacking tiles —
    no re-sort, re-quantize, or host round trip. Row order inside a
    prepared bank is opaque (the head is order-independent), and padding
    rows in the middle are already masked by the -1 label sentinel /
    folded self-norms. Uses:

      * incremental serving-bank growth (``NWNet.add_support``): prepare
        only the new rows (padded to one tile) and concat — O(new) work +
        one device copy, instead of re-preparing the whole bank;
      * banks larger than host/f32 memory: prepare in chunks, concat the
        reduced-precision results (``scripts/bigbank_lab.py --giant``).

    Class windows (C > 128): per-tile window starts concatenate directly,
    but the STATIC window width rides in ``win``'s shape and must agree
    across tiles — narrower banks are widened to the max width with starts
    clamped down (spans stay covered; same scheme as the sharded bank's
    per-shard merge). If any input is un-windowed, or widening would reach
    full width, windows are dropped everywhere (slower aggregation for
    C > 128, never incorrect).

    Callers must pass banks built with the same ``kernel=`` (feature
    normalization is baked into ``s`` and cannot be checked here).
    """
    preps = list(preps)
    if not preps:
        raise ValueError("concat_prepared needs at least one bank")
    if len(preps) == 1:
        return preps[0]
    ref = preps[0]
    for p in preps[1:]:
        if p.s.dtype != ref.s.dtype:
            raise ValueError(
                f"precision mismatch: {p.s.dtype} vs {ref.s.dtype}"
            )
        if p.s.shape[1] != ref.s.shape[1]:
            raise ValueError(
                f"feature width mismatch: {p.s.shape[1]} vs {ref.s.shape[1]}"
            )
        if p.lane.shape[1] != ref.lane.shape[1]:
            raise ValueError(
                "tile size (block_s) mismatch: "
                f"{p.lane.shape[1] * 128} vs {ref.lane.shape[1] * 128}"
            )
        for name in ("s2c", "sscale"):
            if (getattr(p, name) is None) != (getattr(ref, name) is None):
                raise ValueError(
                    f"{name} presence mismatch (different kernel mode or "
                    "precision)"
                )

    wins = [p.win for p in preps]
    if all(w is not None for w in wins):
        c_pad = _round_up(n_classes, 128)
        wb = max(w.shape[1] for w in wins)  # width in 128-lane blocks
        if wb * 128 >= c_pad:
            preps = [p._replace(win=None) for p in preps]
        else:
            uni = []
            for w in wins:
                starts = np.minimum(
                    np.asarray(w)[:, 0], c_pad // 128 - wb
                ).astype(np.int32)
                uni.append(jnp.asarray(np.broadcast_to(
                    starts[:, None], (w.shape[0], wb)).copy()))
            preps = [p._replace(win=w) for p, w in zip(preps, uni)]
    elif any(w is not None for w in wins):
        preps = [p._replace(win=None) for p in preps]

    def cat(field):
        vals = [getattr(p, field) for p in preps]
        return None if vals[0] is None else jnp.concatenate(vals, axis=0)

    return PreparedSupport(
        s=cat("s"), s2c=cat("s2c"), lane=cat("lane"),
        sub=cat("sub"), sscale=cat("sscale"), win=cat("win"),
    )


def mask_prepared_rows(
    prep: PreparedSupport, rows: np.ndarray
) -> PreparedSupport:
    """Tombstone prepared-bank rows: O(removed) device work, no rebuild.

    ``rows`` are PREPARED-row positions (track them via ``prepare_support
    (..., return_order=True)``; identity when the bank was not
    class-sorted). Masking uses exactly the machinery padding rows already
    ride: the compact label turns into the -1 sentinel in BOTH layout
    copies (non-l2 kernels mask on ``lane >= 0``; the one-hot column match
    drops the row from aggregation in every mode), and l2-mode self-norms
    become ``_MASK_S2`` (score ~-1e15, exp underflows to exact 0 — the l2
    serving kernel has no per-tile mask compare by design). Features/
    scales stay: a tombstoned row still streams through the DMA, so
    callers should compact (full re-prepare) once dead rows are a
    meaningful fraction of the bank (``NWNet.remove_support`` does at
    25%). Class windows stay valid — a narrower live span is still
    covered. The reference has no analog: any support edit is a full
    ``precompute()`` (``/root/reference/nwhead/nw.py:118-125``)."""
    rows = np.asarray(rows, dtype=np.int64)
    if rows.size == 0:
        return prep
    block_s = prep.lane.shape[1] * 128
    s_pad = prep.lane.shape[0] * block_s
    if rows.min() < 0 or rows.max() >= s_pad:
        raise IndexError(f"prepared-row index out of range for {s_pad} rows")
    tile = jnp.asarray(rows // block_s, jnp.int32)
    off = rows % block_s
    chunk = jnp.asarray(off // 128, jnp.int32)
    lanep = jnp.asarray(off % 128, jnp.int32)
    lane = prep.lane.at[tile, chunk, lanep].set(-1.0)
    sub = prep.sub.at[tile, lanep, chunk].set(-1.0)
    s2c = prep.s2c
    if s2c is not None:
        s2c = s2c.at[tile, chunk, lanep].set(_MASK_S2)
    return prep._replace(lane=lane, sub=sub, s2c=s2c)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _nw_fwd_kernel(
    scale_ref,  # (1, 1) SMEM — similarity scale (clip) or 1.0
    *refs,
    mode: str,
    s2_input: bool,
    n_s_tiles: int,
    c_pad: int,
    nchunk: int,
    partials: bool = False,
):
    i = 0
    q_ref = refs[i]; i += 1       # (TB, D) VMEM
    s_ref = refs[i]; i += 1       # (TS, D) VMEM
    s2_ref = None
    if s2_input:
        s2_ref = refs[i]; i += 1  # (1, nchunk, 128) f32
    lane_ref = refs[i]; i += 1    # (1, nchunk, 128) f32 labels
    sub_ref = refs[i]; i += 1     # (1, 128, nchunk) f32 labels
    out_ref = refs[i]; i += 1     # (TB, C_pad) out
    mstat_ref = refs[i]; i += 1   # (TB, 128) out
    lstat_ref = refs[i]; i += 1   # (TB, 128) out
    m_ref = refs[i]; i += 1       # (TB, 128) scratch
    l_ref = refs[i]; i += 1       # (TB, 128) scratch
    acc_ref = refs[i]; i += 1     # (TB, C_pad) scratch
    oh_ref = refs[i]; i += 1      # (TS, C_pad) scratch

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Inputs may be f32 (exact) or bf16 (bandwidth-optimized bank): the MXU
    # dot runs at the input precision with f32 accumulation; norms and all
    # softmax statistics are always f32.
    q = q_ref[:]
    s = s_ref[:]
    dot = jax.lax.dot_general(
        q, s, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (TB, TS) f32

    if mode == "l2":
        qf = q.astype(jnp.float32)
        q2 = jnp.sum(qf * qf, axis=1, keepdims=True)  # (TB, 1)
        if s2_input:
            # Precomputed bank self-norms: assemble the (1, TS) row from
            # tiny static lane-major slices (zero relayout).
            s2row = jnp.concatenate(
                [s2_ref[0, t:t + 1, :] for t in range(nchunk)], axis=1
            )
        else:
            sf = s.astype(jnp.float32)
            s2row = jnp.sum(sf * sf, axis=1, keepdims=True).T  # (1, TS)
        d2 = jnp.maximum(q2 - 2.0 * dot + s2row, 0.0)
        score = -jnp.sqrt(d2)
    else:  # 'dot'
        score = dot * scale_ref[0, 0]

    # Masked/padding positions carry label -1: they get score -inf AND match
    # no one-hot column — one tiny aux array serves both purposes.
    valid_row = jnp.concatenate(
        [lane_ref[0, t:t + 1, :] for t in range(nchunk)], axis=1
    ) >= 0.0  # (1, TS)
    score = jnp.where(valid_row, score, _NEG_INF)

    m_prev = m_ref[:, :1]  # (TB, 1)
    l_prev = l_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(score, axis=1, keepdims=True))
    # All-masked-so-far guard: keep exp() arguments finite.
    m_safe = jnp.where(m_new > _NEG_INF / 2, m_new, 0.0)
    alpha = jnp.where(
        m_prev > _NEG_INF / 2, jnp.exp(m_prev - m_safe), 0.0
    )  # (TB, 1)
    p = jnp.where(score > _NEG_INF / 2, jnp.exp(score - m_safe), 0.0)  # (TB, TS)

    l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)

    # One-hot built per 128-row chunk from the sublane-major labels
    # ((128, 1) == iota (128, C_pad) compares — no relayouts).
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (128, c_pad), 1).astype(
        jnp.float32
    )
    for t in range(nchunk):
        col = sub_ref[0, :, t:t + 1]  # (128, 1) f32
        oh_ref[t * 128:(t + 1) * 128, :] = (col == col_ids).astype(jnp.float32)

    pv = jax.lax.dot_general(
        p, oh_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TB, C_pad)
    acc_ref[:] = acc_ref[:] * alpha + pv

    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == n_s_tiles - 1)
    def _finalize():
        if partials:
            # Support-sharded mode: emit raw (acc, m, l) partials for the
            # cross-device online-softmax merge instead of finalizing.
            out_ref[:] = acc_ref[:]
        else:
            l_final = jnp.maximum(l_ref[:, :1], 1e-30)
            probs = acc_ref[:] / l_final
            out_ref[:] = jnp.log(probs + LOG_FLOOR)
        mstat_ref[:] = m_ref[:]
        lstat_ref[:] = l_ref[:]


def _fwd_call(
    q: jnp.ndarray,       # (B, D0) raw queries (normalized already)
    s_p: jnp.ndarray,     # (S_pad, D_pad) prepared bank
    s2c: Optional[jnp.ndarray],
    lane: jnp.ndarray,
    sub: jnp.ndarray,
    scale: jnp.ndarray,
    *,
    mode: str,
    n_classes: int,
    block_b: int,
    interpret: bool,
    partials: bool = False,
):
    B, D0 = q.shape
    s_pad, D = s_p.shape
    n_s = lane.shape[0]
    nchunk = lane.shape[1]
    block_s = nchunk * 128
    c_pad = _round_up(n_classes, 128)
    b_pad = _round_up(B, block_b)

    q_p = jnp.pad(q, ((0, b_pad - B), (0, D - D0)))
    if q_p.dtype != s_p.dtype:  # bf16 bank -> bf16 queries (one-pass MXU)
        q_p = q_p.astype(s_p.dtype)

    n_b = b_pad // block_b

    in_specs = [
        pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((block_b, D), lambda i, j: (i, 0)),
        pl.BlockSpec((block_s, D), lambda i, j: (j, 0)),
    ]
    inputs = [scale.reshape(1, 1), q_p, s_p]
    if s2c is not None:
        in_specs.append(pl.BlockSpec((1, nchunk, 128), lambda i, j: (j, 0, 0)))
        inputs.append(s2c)
    in_specs += [
        pl.BlockSpec((1, nchunk, 128), lambda i, j: (j, 0, 0)),
        pl.BlockSpec((1, 128, nchunk), lambda i, j: (j, 0, 0)),
    ]
    inputs += [lane, sub]

    kernel = functools.partial(
        _nw_fwd_kernel,
        mode=mode,
        s2_input=s2c is not None,
        n_s_tiles=n_s,
        c_pad=c_pad,
        nchunk=nchunk,
        partials=partials,
    )
    flops = 2 * b_pad * s_pad * D + 2 * b_pad * s_pad * c_pad
    out, m_stat, l_stat = pl.pallas_call(
        kernel,
        grid=(n_b, n_s),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((block_b, c_pad), lambda i, j: (i, 0)),
            pl.BlockSpec((block_b, 128), lambda i, j: (i, 0)),
            pl.BlockSpec((block_b, 128), lambda i, j: (i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, c_pad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b, 128), jnp.float32),
            pltpu.VMEM((block_b, 128), jnp.float32),
            pltpu.VMEM((block_b, c_pad), jnp.float32),
            pltpu.VMEM((block_s, c_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(b_pad * D + s_pad * D) * s_p.dtype.itemsize,
            transcendentals=b_pad * s_pad,
        ),
        interpret=interpret,
    )(*inputs)
    if partials:
        return out[:B, :n_classes], m_stat[:B, :1], l_stat[:B, :1]
    return out[:B, :n_classes], m_stat[:, :1], l_stat[:, :1]


def _fwd_pallas(
    q: jnp.ndarray,
    s: jnp.ndarray,
    sy: jnp.ndarray,
    mask: jnp.ndarray,
    scale: jnp.ndarray,
    *,
    mode: str,
    n_classes: int,
    block_b: int,
    block_s: int,
    interpret: bool,
    partials: bool = False,
):
    """Raw-array path (training / one-off calls): pads + packs per call,
    bank self-norms computed in-kernel (differentiable end to end)."""
    B, D0 = q.shape
    S = s.shape[0]
    s_pad = _round_up(S, block_s)
    d_pad = _round_up(D0, 128)
    s_p = jnp.pad(s, ((0, s_pad - S), (0, d_pad - D0)))
    lane, sub = _pack_labels(sy, mask, s_pad, block_s)
    return _fwd_call(
        q, s_p, None, lane, sub, scale,
        mode=mode, n_classes=n_classes, block_b=block_b,
        interpret=interpret, partials=partials,
    )


# ---------------------------------------------------------------------------
# Prepared serving kernel: single program, hand-rolled double-buffered DMA
# ---------------------------------------------------------------------------
#
# Mosaic's automatic grid pipelining leaves ~4-5 us/call of per-grid-step
# overhead + unoverlapped VPU work on the table at CUB scale (measured
# decomposition: scripts/kernel_lab.py). This kernel runs the whole support
# sweep as ONE program: a fori_loop streams bank tiles HBM->VMEM through a
# two-slot double buffer (pallas guide pattern) while computing the previous
# tile. Measured: 19 us vs 23 us for the grid version at B=64, S=5994, D=512
# (0.89 vs 0.73 of the STREAM-calibrated bandwidth).

def _nw_prepared_kernel(
    scale_ref,   # SMEM (1,1)
    *refs,
    mode: str, n_tiles: int, c_pad: int, nchunk: int, block_s: int,
    s2_input: bool, quant: bool = False, quant4: bool = False,
    int4_impl: str = "mxu",
    partials: bool = False,
    win_w: int = 0, softmax_impl: str = "exp", fold2: bool = True,
    agg_bf16: bool = False, meta_stream: bool = False,
    oh_lane: bool = False, n_sel: int = 0,
):
    i = 0
    q_ref = refs[i]; i += 1       # (TB, D) VMEM (int8 when quant)
    s_hbm = refs[i]; i += 1       # (S_pad, D) ANY/HBM — manually DMA'd
    s2_ref = None
    if s2_input:
        s2_ref = refs[i]; i += 1  # (n_tiles, 1, TS); VMEM, or ANY/HBM when
        #                           meta_stream (manually DMA'd per tile)
    qscale_ref = sscale_ref = None
    if quant:
        qscale_ref = refs[i]; i += 1  # (TB, 128) f32 per-query scales
        sscale_ref = refs[i]; i += 1  # (n_tiles, 1, TS) f32 row scales
    lane_ref = refs[i]; i += 1    # (n_tiles, 1, TS) labels (flat)
    sub_ref = None
    if not oh_lane:
        sub_ref = refs[i]; i += 1  # (n_tiles, 128, nchunk)
    win_ref = None
    if win_w:
        win_ref = refs[i]; i += 1  # SMEM (n_tiles, win_w/128) int32 blocks
    tsel_ref = None
    if n_sel:
        # IVF-pruned serving (ops/ivf.py): the loop streams only the bank
        # tiles named here instead of all n_tiles. One SMEM row (1, n_sel)
        # of int32 tile ids, -1 = empty slot (duplicates removed by the
        # router) — empty slots skip the DMA and the whole tile body, so
        # the per-call cost scales with the UNION of selected tiles.
        tsel_ref = refs[i]; i += 1  # SMEM (1, n_sel) int32
    out_ref = refs[i]; i += 1     # (TB, C_pad)
    mstat_ref = lstat_ref = None
    if partials:
        mstat_ref = refs[i]; i += 1  # (TB, 128) out — running max
        lstat_ref = refs[i]; i += 1  # (TB, 128) out — normalizer
    sbuf = refs[i]; i += 1        # (2, TS, D) VMEM scratch — double buffer
    m_ref = refs[i]; i += 1
    l_ref = refs[i]; i += 1
    acc_ref = refs[i]; i += 1
    oh_ref = refs[i]; i += 1      # (TS, C_pad) scratch
    sem = refs[i]; i += 1         # DMA semaphores (2,)
    ubuf = None
    if quant4:
        ubuf = refs[i]; i += 1    # (TS, D) int8 — nibble-unpacked tile
    s2buf = ssbuf = lanebuf = subbuf = winbuf = msem = None
    if meta_stream:
        # Metadata double buffers (+ their DMA semaphore lanes): the flat
        # f32 per-row arrays come in as (1, 1, TS) tile slices, the
        # sublane-major label copy as (1, 128, nchunk). The class-window
        # block array streams too — whole-array SMEM residency pads each
        # (2,) s32 row to 512 B, so n_tiles > ~2048 blows the 1 MB SMEM
        # budget (the 8M-row compile failure).
        if s2_input:
            s2buf = refs[i]; i += 1   # (2, 1, TS) VMEM
        if quant:
            ssbuf = refs[i]; i += 1   # (2, 1, TS) VMEM
        lanebuf = refs[i]; i += 1     # (2, 1, TS) VMEM
        if not oh_lane:
            subbuf = refs[i]; i += 1  # (2, 128, nchunk_pad128) VMEM
        if win_w:
            winbuf = refs[i]; i += 1  # (2, 1, win_cols) SMEM
        msem = refs[i]; i += 1        # DMA semaphores (2, 5)

    q = q_ref[:]

    # Loop-invariant hoists (the fori_loop body is NOT hoisted by Mosaic):
    # the per-query norm q2 and the per-query dequant scale column are
    # computed once per call instead of once per bank tile. The caller
    # pre-DOUBLES the l2 query (f32/bf16: q *= 2; int8: qscale *= 2 — both
    # exact power-of-2 scalings), so the score chain's per-element
    # ``2.0 * dot`` multiply disappears: d2 = q2 - dot2 + s2 with
    # dot2 == 2*dot bitwise and q2 recovered exactly as 0.25*sum(qf^2).
    qcol = qscale_ref[:, :1] if quant else None
    q2 = None
    if mode == "l2" and fold2:
        qf = q.astype(jnp.float32)
        if quant:
            qf = qf * qcol
        q2 = 0.25 * jnp.sum(qf * qf, axis=1, keepdims=True)
    q_lo_sum8 = q_stack = None
    if quant4 and int4_impl in ("mxu", "mxu_and8", "_probe_noand", "vpu2"):
        # The lo nibble is stored BIASED (+8): dot(q_lo, lo) =
        # dot(q_lo, u') - 8*sum(q_lo). The bias correction is per-query —
        # hoist it out of the tile loop (one lane reduce per call). The
        # [q_lo; q_hi] sublane stack for the shared u' matmul is likewise
        # loop-invariant — Mosaic does NOT hoist it out of the fori_loop
        # body on its own.
        hd = q.shape[1] // 2
        q_lo_sum8 = 8 * jnp.sum(
            q[:, :hd].astype(jnp.int32), axis=1, keepdims=True
        )
        if int4_impl != "vpu2":
            q_stack = jnp.concatenate([q[:, :hd], q[:, hd:]], axis=0)
    q_stack3 = None
    if quant4 and int4_impl == "mxu2":
        # One-matmul layout: LHS row blocks [0|q_hi], [q_lo|0], [q_hi|0]
        # against the per-tile RHS [u' | b] — all three nibble dot
        # products from a single MXU op per tile (the 3-op variant pays
        # per-op issue/pass overhead three times). Loop-invariant.
        hd = q.shape[1] // 2
        q_lo_sum8 = 8 * jnp.sum(
            q[:, :hd].astype(jnp.int32), axis=1, keepdims=True
        )
        z = jnp.zeros_like(q[:, :hd])
        q_stack3 = jnp.concatenate([
            jnp.concatenate([z, q[:, hd:]], axis=1),
            jnp.concatenate([q[:, :hd], z], axis=1),
            jnp.concatenate([q[:, hd:], z], axis=1),
        ], axis=0)

    def get_dma(slot, idx):
        return pltpu.make_async_copy(
            s_hbm.at[pl.ds(idx * block_s, block_s), :],
            sbuf.at[slot],
            sem.at[slot],
        )

    def meta_dmas(slot, idx):
        if not meta_stream:
            return []
        cps = []
        for k, (src, dst) in enumerate((
            (s2_ref, s2buf), (sscale_ref, ssbuf),
            (lane_ref, lanebuf), (sub_ref, subbuf),
            (win_ref if winbuf is not None else None, winbuf),
        )):
            if src is not None:
                cps.append(pltpu.make_async_copy(
                    src.at[pl.ds(idx, 1)], dst.at[pl.ds(slot, 1)],
                    msem.at[slot, k],
                ))
        return cps

    m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def start_tile(slot, idx):
        get_dma(slot, idx).start()
        for cp in meta_dmas(slot, idx):
            cp.start()

    if n_sel:
        first = tsel_ref[0, 0, 0]

        @pl.when(first >= 0)
        def _():
            start_tile(0, first)
    else:
        start_tile(0, 0)

    # Windowed aggregation: the one-hot/label-matmul width is the class
    # window W instead of the full c_pad (rows are class-sorted at
    # prepare time; each tile's labels fit [w, w + W)).
    cw = win_w if win_w else c_pad
    if oh_lane:
        # Class ids in the SUBLANE dim: the one-hot is built transposed
        # (cw, block_s) from the lane-major labels.
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (cw, 1), 0).astype(
            jnp.float32
        )
    else:
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (128, cw), 1).astype(
            jnp.float32
        )

    def tile_body(slot, idx):
        get_dma(slot, idx).wait()
        for cp in meta_dmas(slot, idx):
            cp.wait()
        s = sbuf[slot]
        dot_i = None
        if quant and int4_impl == "_probe_skip":
            # TIMING-ONLY (any quant precision): no dot — DMA + the
            # shared dequant/softmax/agg tail on an iota (wrong values;
            # the async copy + semaphore wait are side-effect ops Mosaic
            # keeps even with the tile unread).
            dot_i = jax.lax.broadcasted_iota(
                jnp.int32, (q.shape[0], s.shape[0]), 1
            )
        elif quant4:
            # The packed bank is stored (and DMA'd) as uint8 — the dtype
            # is the int4 marker. Reinterpret the tile's VALUES as int8
            # here (free, same width); an XLA-level bitcast before the
            # kernel materialized a full bank copy per call.
            s = pltpu.bitcast(s, jnp.int8)
            # int4 tiles arrive PACKED: byte = (hi << 4) | (lo + 8), i.e.
            # b_signed = 16*hi + u' with u' = lo + 8 in [0, 15]. Feature
            # pairs were packed as (j, j + D/2), so the two halves land in
            # static lane windows. Two unpack strategies (scripts/
            # int4_lab.py; the per-byte VPU chain was the int4 path's wall
            # — at 1M rows it cost more than the DMA it saved):
            half = s.shape[-1]
            if int4_impl == "_probe_raw":
                # TIMING-ONLY: half-width dot straight on the packed
                # bytes — no scratch, no AND (wrong values).
                dot_i = jax.lax.dot_general(
                    q[:, half:], s, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            elif int4_impl in ("mxu", "mxu_and8", "_probe_noand",
                               "_probe_1mm"):
                # MXU-side unpack: recover both nibbles' dot products from
                # matmuls against the PACKED bytes. dot(q_hi, b) =
                # 16*dot(q_hi, hi) + dot(q_hi, u'), so with one extra
                # operand u' = b & 0x0F (ONE i32 AND per FOUR bytes via
                # sublane bitcast — no per-byte converts, no shifts):
                #   hi term = (dot(q_hi, b) - dot(q_hi, u')) >> 4  (exact)
                #   lo term = dot(q_lo, u') - 8*sum(q_lo)          (hoisted)
                # Three half-width int8 MXU passes (b once, u' twice via a
                # stacked 2TB-row matmul) replace the per-byte VPU chain.
                # The _probe_* variants are TIMING-ONLY decompositions
                # (wrong values): _probe_noand skips the bitcast-AND,
                # _probe_1mm also skips the stacked matmul.
                tb = q.shape[0]
                if int4_impl == "_probe_noand":
                    ubuf[:] = s
                elif int4_impl == "mxu_and8":
                    # i8-domain AND (Mosaic legalizes bitwise ops on i8
                    # even though it rejects i8 shifts): no bitcast
                    # relayouts at all.
                    ubuf[:] = s & 15
                else:
                    w = pltpu.bitcast(s, jnp.int32)
                    ubuf[:] = pltpu.bitcast(w & 0x0F0F0F0F, jnp.int8)
                dot_b = jax.lax.dot_general(
                    q[:, half:], s, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                if int4_impl == "_probe_1mm":
                    dot_i = dot_b
                else:
                    dot_u = jax.lax.dot_general(
                        q_stack, ubuf[:], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    dot_i = (
                        ((dot_b - dot_u[tb:]) >> 4) + dot_u[:tb]
                        - q_lo_sum8
                    )
            elif int4_impl == "mxu2":
                # Single-matmul variant: RHS = [u' | b] in one (TS, D)
                # scratch, LHS = the hoisted 3TB-row block layout — one
                # MXU op per tile yields all three nibble dot products.
                w = pltpu.bitcast(s, jnp.int32)
                ubuf[:, :half] = pltpu.bitcast(w & 0x0F0F0F0F, jnp.int8)
                ubuf[:, half:] = s
                tb = q.shape[0]
                dot3 = jax.lax.dot_general(
                    q_stack3, ubuf[:], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                dot_i = (
                    ((dot3[:tb] - dot3[2 * tb:]) >> 4) + dot3[tb:2 * tb]
                    - q_lo_sum8
                )
            elif int4_impl == "vpu2":
                # Convert-free VPU unpack (round 5 — the large-batch int4
                # fix): the legacy 'vpu' chain's wall is the per-byte
                # i8<->i32 CONVERTS (vector relayouts), not the bit math.
                # Here the lo half stays BIASED in the scratch (u' = lo+8,
                # one packed i8 AND — Mosaic legalizes i8 bitwise ops) and
                # the hoisted -8*sum(q_lo) corrects the dot; the hi nibble
                # is extracted in the PACKED i32 domain (bitcasts are
                # free): h = (w >> 4) & 0x0F0F0F0F gives each byte's
                # unsigned hi nibble (the i32 shift's cross-byte spill is
                # masked off), and OR-ing bit3's copies into bits 4-7
                # (m << 1..4) IS two's-complement nibble sign extension —
                # no cross-byte borrows, unlike a packed subtract.
                ubuf[:, :half] = s & 15
                w = pltpu.bitcast(s, jnp.int32)
                h = (w >> 4) & 0x0F0F0F0F
                m8 = h & 0x08080808
                h = h | (m8 << 1) | (m8 << 2) | (m8 << 3) | (m8 << 4)
                ubuf[:, half:] = pltpu.bitcast(h, jnp.int8)
                dot_i = jax.lax.dot_general(
                    q, ubuf[:], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ) - q_lo_sum8
            else:
                # VPU unpack into the (TS, D) int8 scratch; the biased lo
                # needs only and+sub (no compare/select), the hi nibble is
                # the byte's arithmetic >> 4.
                xi = s.astype(jnp.int32)
                ubuf[:, :half] = (jnp.bitwise_and(xi, 15) - 8).astype(
                    jnp.int8
                )
                ubuf[:, half:] = (xi >> 4).astype(jnp.int8)
                s = ubuf[:]

        if quant:
            # int8 x int8 MXU dot, dequantized by the per-row scales:
            # dot_f[i, k] = dot_i32[i, k] * qscale_i * sscale_k.
            if dot_i is None:
                dot_i = jax.lax.dot_general(
                    q, s, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            # Flat (n_tiles, 1, TS) layout: one leading-dim slice per tile
            # (the old (n_tiles, nchunk, 128) layout cost nchunk slices +
            # a lane concat on the VPU every tile).
            ssrow = (
                ssbuf[slot] if meta_stream
                else sscale_ref[pl.ds(idx, 1)]
            ).reshape(1, block_s)
            dot = dot_i.astype(jnp.float32) * qcol * ssrow
        elif int4_impl == "_probe_skip":
            # TIMING-ONLY (float banks): DMA + softmax/agg tail, no dot.
            # (Mosaic iota must be integer-typed.)
            dot = jax.lax.broadcasted_iota(
                jnp.int32, (q.shape[0], s.shape[0]), 1
            ).astype(jnp.float32) * -1e-3
        else:
            dot = jax.lax.dot_general(
                q, s, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if mode == "l2":
            if s2_input:
                s2row = (
                    s2buf[slot] if meta_stream
                    else s2_ref[pl.ds(idx, 1)]
                ).reshape(1, block_s)
            else:
                sf = s.astype(jnp.float32)
                s2row = jnp.sum(sf * sf, axis=1, keepdims=True).T
            if fold2:
                # The caller pre-doubled q/qscale: dot == 2*(q.s) already.
                d2 = jnp.maximum(q2 - dot + s2row, 0.0)
            else:
                qf_t = q.astype(jnp.float32)
                if quant:
                    qf_t = qf_t * qcol
                q2_t = jnp.sum(qf_t * qf_t, axis=1, keepdims=True)
                d2 = jnp.maximum(q2_t - 2.0 * dot + s2row, 0.0)
            score = -jnp.sqrt(d2)
        elif quant and fold2:
            # scale is folded into the per-query dequant column by the
            # caller (one (B,) mul) — skip the per-element multiply.
            score = dot
        else:
            score = dot * scale_ref[0, 0]

        if mode != "l2" or not s2_input:
            # l2 + prepared norms needs no mask here: prepare_support folds
            # validity into the self-norms (_MASK_S2 -> score ~-1e15 ->
            # exp underflows to exactly 0 against any valid row's max, and
            # an all-invalid support still lands on the log-floor).
            valid_row = (
                lanebuf[slot] if meta_stream
                else lane_ref[pl.ds(idx, 1)]
            ).reshape(1, block_s) >= 0.0
            score = jnp.where(valid_row, score, _NEG_INF)

        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(score, axis=1, keepdims=True))
        m_safe = jnp.where(m_new > _NEG_INF / 2, m_new, 0.0)
        alpha = jnp.where(m_prev > _NEG_INF / 2, jnp.exp(m_prev - m_safe), 0.0)
        if softmax_impl == "exp":
            p = jnp.where(score > _NEG_INF / 2, jnp.exp(score - m_safe), 0.0)
        elif softmax_impl == "exp_noguard":
            # The guard is redundant: score and m_safe are FINITE (masked
            # rows carry ~-1e15/-3.4e38, m_safe is where-guarded to 0 when
            # every row so far is masked), so score - m_safe is either a
            # huge negative f32 or -inf from overflow — exp of both is
            # exactly 0.0, which is what the where produced. Saves a
            # compare + select per (TB, TS) element on the VPU hot chain.
            p = jnp.exp(score - m_safe)
        else:
            assert softmax_impl == "exp2_noguard"
            # Same values as exp (exp2(x*log2e) == exp(x) to rounding);
            # measures whether Mosaic's exp costs more than exp2 + mul.
            p = jnp.exp2((score - m_safe) * 1.4426950408889634)
        l_ref[:] = jnp.broadcast_to(
            l_prev * alpha + jnp.sum(p, axis=1, keepdims=True), l_ref.shape
        )

        if win_w:
            wstart = (
                winbuf[slot, 0, 0] if meta_stream else win_ref[idx, 0]
            ) * 128
            wbase = wstart.astype(jnp.float32)
        # agg_bf16: the aggregation matmul runs with bf16 inputs (f32 MXU
        # accumulate). The one-hot is EXACT in bf16 (0/1); the only rounding
        # is p's f32->bf16 cast (~2^-9 relative on each prob mass term). At
        # whole-batch tiles (block_b >= 256) this matmul is the kernel's
        # dominant MXU term and bf16 runs it in fewer passes; at block_b=64
        # the cast overhead loses (measured — see CLAUDE.md bf16-agg note).
        oh_dtype = jnp.bfloat16 if agg_bf16 else jnp.float32
        if oh_lane:
            # Transposed one-hot straight from the LANE-major labels: one
            # (cw, 1) sublane-iota compare against the (1, TS) label row
            # builds the whole (cw, TS) one-hot — no sublane-major label
            # copy (the sub array and its stream disappear), no per-chunk
            # strided writes. The aggregation contracts BOTH lane dims
            # (p (TB, TS) x ohT (cw, TS) -> (TB, cw)); Mosaic lowers the
            # rhs-transposed matmul natively (probed bit-exact vs the
            # (TS, cw) orientation on v5e).
            lrow = (
                lanebuf[slot] if meta_stream else lane_ref[pl.ds(idx, 1)]
            ).reshape(1, block_s)
            if win_w:
                lrow = lrow - wbase  # labels exact in f32; -1 stays invalid
            oh_ref[:] = (col_ids == lrow).astype(oh_dtype)
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16) if agg_bf16 else p, oh_ref[:],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            for t in range(nchunk):
                col = (
                    subbuf[slot, :, t:t + 1] if meta_stream
                    else sub_ref[pl.ds(idx, 1), :, t:t + 1]
                ).reshape(128, 1)
                if win_w:
                    col = col - wbase  # labels exact in f32; -1 invalid
                oh_ref[t * 128:(t + 1) * 128, :] = (col == col_ids).astype(
                    oh_dtype
                )

            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16) if agg_bf16 else p, oh_ref[:],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if win_w:
            acc_ref[:] = acc_ref[:] * alpha
            # block-idx * 128: Mosaic statically proves lane alignment.
            sl = pl.ds(wstart, win_w)
            acc_ref[:, sl] = acc_ref[:, sl] + pv
        else:
            acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    n_iter = n_sel if n_sel else n_tiles

    def body(j, _):
        slot = j % 2
        if n_sel:
            # Selected-tile stream: slot j holds bank tile tsel[j] (-1 =
            # empty slot — no DMA was started for it, and the whole tile
            # body is skipped so the online-softmax state is untouched).
            idx = tsel_ref[0, 0, j]

            @pl.when(j + 1 < n_iter)
            def _():
                nidx = tsel_ref[0, 0, j + 1]

                @pl.when(nidx >= 0)
                def _():
                    start_tile((j + 1) % 2, nidx)

            @pl.when(idx >= 0)
            def _():
                tile_body(slot, idx)
        else:
            @pl.when(j + 1 < n_iter)
            def _():
                start_tile((j + 1) % 2, j + 1)

            tile_body(slot, j)
        return 0

    jax.lax.fori_loop(0, n_iter, body, 0)
    if partials:
        # Support-sharded serving: emit raw (acc, m, l) for the cross-device
        # online-softmax merge (parallel.merge_partials) instead of
        # finalizing locally.
        out_ref[:] = acc_ref[:]
        mstat_ref[:] = m_ref[:]
        lstat_ref[:] = l_ref[:]
    else:
        l_final = jnp.maximum(l_ref[:, :1], 1e-30)
        out_ref[:] = jnp.log(acc_ref[:] / l_final + LOG_FLOOR)


def _prepared_call(q, prepared: PreparedSupport, scale, *, mode, n_classes,
                   block_b, interpret, partials=False, softmax_impl="exp",
                   fold2=True, agg_precision="f32", meta_stream=None,
                   oh_impl="lane", int4_impl="mxu", tile_sel=None):
    s_p, s2c, lane, sub = prepared.s, prepared.s2c, prepared.lane, prepared.sub
    B, D0 = q.shape
    _, D = s_p.shape
    quant4 = s_p.dtype == jnp.uint8  # nibble-packed int4 bank
    if quant4:
        D = 2 * D  # logical feature width; the bank stores D/2 bytes/row
        # The bank stays uint8 all the way into the kernel, which
        # bitcasts VALUES to int8 after the tile DMA (pltpu.bitcast,
        # free — same width). An XLA-level bitcast_convert_type here
        # looked free but was not: as a jit-argument boundary op it
        # MATERIALIZED a full copy of the packed bank every call
        # (~0.7 ms of HBM traffic at 1M rows — measured via the
        # _probe_skip decomposition, scripts/int4_lab.py round 4).
    n_tiles = lane.shape[0]
    nchunk = lane.shape[1]
    block_s = nchunk * 128
    c_pad = _round_up(n_classes, 128)
    b_pad = _round_up(B, block_b)
    q_p = jnp.pad(q, ((0, b_pad - B), (0, D - D0)))
    quant = quant4 or s_p.dtype == jnp.int8
    if quant:
        # Symmetric per-query quantization matching the bank's scheme.
        qf = q_p.astype(jnp.float32)
        amax = jnp.max(jnp.abs(qf), axis=1)
        qscale = jnp.where(amax > 0, amax / 127.0, 1.0)
        q_p = jnp.clip(jnp.round(qf / qscale[:, None]), -127, 127).astype(jnp.int8)
        if fold2 and mode == "l2":
            # Pre-double the dequant scale (exact) so the kernel's score
            # chain skips the per-element 2.0*dot multiply; the kernel
            # recovers q2 exactly as 0.25*sum((q*qscale)^2).
            qscale = qscale * 2.0
        elif fold2:
            # Fold the similarity scale (1.0 for dot/cosine, learnable for
            # clip) into the per-query dequant column: one (B,) multiply
            # here replaces a (B, S) per-element multiply in the kernel.
            qscale = qscale * scale.astype(jnp.float32)
        qscale_b = jnp.broadcast_to(qscale[:, None], (b_pad, 128))
    else:
        if q_p.dtype != s_p.dtype:
            q_p = q_p.astype(s_p.dtype)
        if fold2 and mode == "l2":
            # Exact power-of-2 scaling (f32/bf16): dot(2q, s) == 2*dot(q, s)
            # bitwise, so the kernel drops its 2.0*dot multiply.
            q_p = q_p * jnp.asarray(2.0, q_p.dtype)

    s2_input = s2c is not None

    win = prepared.win
    win_w = win.shape[1] * 128 if win is not None else 0
    oh_lane = oh_impl == "lane"
    if meta_stream is None:
        # Resident VMEM cost of the whole-array metadata layout: one flat
        # f32 row per present array, plus (oh_impl='sub') the sublane-major
        # label copy whose nchunk lane dim pads to 128 in VMEM (16x at
        # block_s=1024 — confirmed by the 4M compile error's input-window
        # allocation). Past the threshold, stream metadata tiles through
        # the double buffer instead — mandatory for multi-million-row
        # banks. The class-window array independently forces streaming
        # past ~2048 tiles: whole-array SMEM residency pads each (wcols,)
        # s32 row to 512 B against the 1 MB SMEM budget.
        n_flat = 1 + int(s2_input) + int(quant)
        resident = n_tiles * n_flat * block_s * 4
        if not oh_lane:
            resident += n_tiles * 128 * _round_up(nchunk, 128) * 4
        meta_stream = resident > _META_STREAM_BYTES or (
            win_w > 0 and n_tiles > 1800
        )

    # Per-row metadata rides in the flat (n_tiles, 1, block_s) layout so
    # the kernel loads each tile's row with ONE leading-dim slice (the
    # rows are contiguous either way — this is a free reshape).
    flat = (n_tiles, 1, block_s)
    meta_spec = (
        pl.BlockSpec(memory_space=pl.ANY) if meta_stream
        else pl.BlockSpec(flat, lambda i: (0, 0, 0))
    )
    in_specs = [
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((block_b, D), lambda i: (i, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    inputs = [scale.reshape(1, 1), q_p, s_p]
    if s2_input:
        in_specs.append(meta_spec)
        inputs.append(s2c.reshape(flat))
    if quant:
        in_specs += [
            pl.BlockSpec((block_b, 128), lambda i: (i, 0)),
            meta_spec,
        ]
        inputs += [qscale_b, prepared.sscale.reshape(flat)]
    in_specs.append(meta_spec)
    inputs.append(lane.reshape(flat))
    if not oh_lane:
        if meta_stream:
            # DMA slices must be 128-aligned along the lane dim — pad the
            # sublane-major label copy's nchunk lanes up to a tile (the
            # resident layout pays the same padding implicitly in VMEM;
            # here it becomes real HBM bytes: 64 KB/tile at block_s=1024,
            # small next to the bank rows).
            sub = jnp.pad(
                sub, ((0, 0), (0, 0), (0, _round_up(nchunk, 128) - nchunk)),
                constant_values=-1.0,
            )
        in_specs.append(
            pl.BlockSpec(memory_space=pl.ANY) if meta_stream
            else pl.BlockSpec(sub.shape, lambda i: (0, 0, 0))
        )
        inputs.append(sub)
    if win_w:
        if meta_stream:
            # Whole-array SMEM residency pads each (wcols,) s32 row to
            # 512 B (n_tiles > ~2048 blows the 1 MB SMEM budget) — stream
            # one row per tile into an SMEM slot instead. DMA slices must
            # be 128-aligned along the lane dim, so pad wcols up to 128
            # (512 B/tile of extra traffic — noise).
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
            inputs.append(jnp.pad(
                win.reshape(win.shape[0], 1, win.shape[1]),
                ((0, 0), (0, 0), (0, 128 - win.shape[1])),
            ))
        else:
            in_specs.append(pl.BlockSpec(
                win.shape, lambda i: (0, 0), memory_space=pltpu.SMEM
            ))
            inputs.append(win)

    n_sel = 0
    if tile_sel is not None:
        # IVF-pruned serving (ops/ivf.py): stream only these tile ids
        # (-1 = empty slot). SMEM ROWS — an (n_sel, 1) column would pad
        # every 4-byte row to 512 B against the 1 MB SMEM budget. A 1-D
        # (or single-row) selection is shared by every query block; a 2-D
        # (n_groups, n_sel) selection gives EACH query block its own tile
        # subset (grouped routing: per-group unions stay small when the
        # batch is route-sorted, so total DMA/compute is the sum of small
        # unions instead of every query paying the whole batch's union).
        tsel = tile_sel.astype(jnp.int32)
        if tsel.ndim == 1:
            tsel = tsel.reshape(1, -1)
        n_sel = tsel.shape[1]
        # 3-D (rows, 1, n_sel) layout: a (1, 1, n_sel) block's trailing
        # two dims EQUAL the array dims, which is the only block shape
        # Mosaic accepts for a per-program row of an SMEM operand (a 2-D
        # (1, n_sel) block of an (R, n_sel) array violates the
        # divisible-by-8 sublane rule).
        tsel = tsel.reshape(tsel.shape[0], 1, n_sel)
        if tsel.shape[0] == 1:
            in_specs.append(pl.BlockSpec(
                tsel.shape, lambda i: (0, 0, 0), memory_space=pltpu.SMEM
            ))
        else:
            if tsel.shape[0] != b_pad // block_b:
                raise ValueError(
                    f"tile_sel rows ({tsel.shape[0]}) must match the "
                    f"query-block grid ({b_pad // block_b} blocks of "
                    f"{block_b})"
                )
            in_specs.append(pl.BlockSpec(
                (1, 1, n_sel), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
            ))
        inputs.append(tsel)

    out_specs = pl.BlockSpec((block_b, c_pad), lambda i: (i, 0))
    out_shape = jax.ShapeDtypeStruct((b_pad, c_pad), jnp.float32)
    if partials:
        stat_spec = pl.BlockSpec((block_b, 128), lambda i: (i, 0))
        stat_shape = jax.ShapeDtypeStruct((b_pad, 128), jnp.float32)
        out_specs = (out_specs, stat_spec, stat_spec)
        out_shape = (out_shape, stat_shape, stat_shape)

    agg_bf16 = agg_precision == "bf16"
    scratch_shapes = [
        # int4 banks stream PACKED (block_s, D/2) byte tiles; the kernel
        # unpacks into the dedicated (block_s, D) int8 scratch below.
        pltpu.VMEM((2, block_s, D // 2 if quant4 else D), s_p.dtype),
        pltpu.VMEM((block_b, 128), jnp.float32),
        pltpu.VMEM((block_b, 128), jnp.float32),
        pltpu.VMEM((block_b, c_pad), jnp.float32),
        pltpu.VMEM(
            # oh_impl='lane' builds the one-hot transposed (classes in
            # sublanes) straight from the lane-major labels.
            (win_w if win_w else c_pad, block_s) if oh_lane
            else (block_s, win_w if win_w else c_pad),
            jnp.bfloat16 if agg_bf16 else jnp.float32,
        ),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if quant4:
        # 'mxu' only materializes the lo-nibble bytes u' = b & 0x0F (half
        # width); 'mxu2' holds [u' | b]; the VPU chain unpacks the full
        # (block_s, D) int8 tile.
        half_scr = int4_impl in (
            "mxu", "mxu_and8", "_probe_noand", "_probe_1mm", "_probe_raw",
            "_probe_skip",
        )
        scratch_shapes.append(pltpu.VMEM(
            (block_s, D // 2 if half_scr else D), jnp.int8
        ))
    if meta_stream:
        if s2_input:
            scratch_shapes.append(pltpu.VMEM((2, 1, block_s), jnp.float32))
        if quant:
            scratch_shapes.append(pltpu.VMEM((2, 1, block_s), jnp.float32))
        scratch_shapes.append(pltpu.VMEM((2, 1, block_s), jnp.float32))
        if not oh_lane:
            scratch_shapes.append(
                pltpu.VMEM((2, 128, _round_up(nchunk, 128)), jnp.float32)
            )
        if win_w:
            scratch_shapes.append(pltpu.SMEM((2, 1, 128), jnp.int32))
        scratch_shapes.append(pltpu.SemaphoreType.DMA((2, 5)))
    out = pl.pallas_call(
        functools.partial(
            _nw_prepared_kernel, mode=mode, n_tiles=n_tiles, c_pad=c_pad,
            nchunk=nchunk, block_s=block_s, s2_input=s2_input, quant=quant,
            quant4=quant4, int4_impl=int4_impl,
            partials=partials, win_w=win_w, softmax_impl=softmax_impl,
            fold2=fold2, agg_bf16=agg_bf16, meta_stream=meta_stream,
            oh_lane=oh_lane, n_sel=n_sel,
        ),
        grid=(b_pad // block_b,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(*inputs)
    if partials:
        acc, m_stat, l_stat = out
        return m_stat[:B, :1], l_stat[:B, :1], acc[:B, :n_classes]
    return out[:B, :n_classes]


def nw_fused_from_prepared(
    qfeat: jnp.ndarray,
    prepared: PreparedSupport,
    n_classes: int,
    *,
    kernel: str = "euclidean",
    kernel_params: Optional[Dict[str, Any]] = None,
    block_b: Optional[int] = None,
    interpret: Optional[bool] = None,
    partials: bool = False,
    softmax_impl: str = "exp",
    _fold2: bool = True,
    agg_precision: str = "f32",
    meta_stream: Optional[bool] = None,
    oh_impl: str = "lane",
    int4_impl: Optional[str] = None,
    tile_sel: Optional[jnp.ndarray] = None,
):
    """Serving fast path: fused NW log-probs over a ``prepare_support``
    bank. Per-call HBM traffic is one streamed pass over the bank (plus the
    tiny label/norm arrays), driven by the hand-rolled double-buffered DMA
    kernel. Inference-only (no VJP — use the raw-array
    ``nw_fused_log_probs`` for training).

    ``partials=True`` returns the raw online-softmax statistics
    ``(m (B, 1), l (B, 1), acc (B, C))`` instead of finalizing — the
    support-sharded serving path (``parallel.ShardedSupportBank``) runs this
    per shard and merges with one tiny collective. Works for f32/bf16/int8
    banks (the same double-buffered kernel, finalization skipped).

    ``agg_precision='bf16'`` runs the label-aggregation matmul with bf16
    inputs (f32 accumulate): the one-hot stays exact, p picks up ~2^-9
    relative rounding. At whole-batch tiles (B >= 256) that matmul is the
    dominant MXU term, so this trades ~1e-3-level prob error for
    throughput on reduced-precision banks.

    ``oh_impl='lane'`` (default) builds the per-tile one-hot TRANSPOSED
    (classes in sublanes) straight from the lane-major labels and contracts
    both lane dims in the aggregation matmul — the sublane-major label copy
    (and, when streaming, its 64 KB/tile DMA) disappears, and resident
    metadata shrinks 6x so much larger banks keep the faster resident
    layout. Measured on v5e: bit-identical to 'sub' (compiled parity probe,
    scripts/ohlane_lab.py) and 2-8% faster at 1M-row scale (int8 B=64
    +8.2%), flat at CUB scale. 'sub' keeps the nchunk-loop orientation for
    re-measurement.

    ``int4_impl`` picks the nibble-unpack strategy for int4 banks — the
    per-byte VPU unpack was the int4 path's wall (first on-chip run: B=64
    at 1M rows cost 2.08 ms vs int8's 1.01, i.e. the unpack burned more
    than the DMA it saved):
    ``None`` (default) — the measured auto-select: 'mxu' at block_b<=128,
    'vpu' above. 'mxu' recovers both nibbles' dot products from int8 MXU
    matmuls against the PACKED bytes (the biased-lo packing makes the
    byte an exact affine function of the codes); the only per-byte VPU
    work is one i32 AND per four bytes. 'vpu' — unpacks each tile into a
    full-width int8 scratch ('select'/'shift32' are accepted as legacy
    aliases; 'shift8' is rejected — Mosaic cannot legalize i8 vector
    shifts). Value-identical; measured in scripts/int4_lab.py."""
    kernel_params = kernel_params or {}
    if int4_impl in ("select", "shift32"):
        int4_impl = "vpu"
    if int4_impl is not None and int4_impl.startswith("_probe"):
        # Timing-only decompositions: they return WRONG probabilities
        # (iota scores / half dots). Labs opt in knowingly; anyone else
        # must hear about it loudly.
        warnings.warn(
            f"int4_impl={int4_impl!r} is a TIMING-ONLY probe that returns "
            "wrong probabilities — never use it on a serving path",
            stacklevel=2,
        )
    if int4_impl is not None and int4_impl not in (
        "vpu", "vpu2", "mxu", "mxu2", "mxu_and8", "_probe_noand",
        "_probe_1mm", "_probe_raw", "_probe_skip",
    ):
        raise ValueError(
            f"unknown int4_impl {int4_impl!r} (use 'mxu', 'vpu', or None "
            "for the measured auto-select; 'shift8' is not legalizable on "
            "current Mosaic)"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if block_b is None:
        # The prepared bank's tile size rides in lane's (n_tiles, nchunk,
        # 128) shape — the stack-budget term needs it.
        block_b = _default_block_b(
            qfeat.shape[0], n_classes, prepared.lane.shape[1] * 128
        )
    if int4_impl is None:
        # Measured auto-select (scripts/int4_lab.py, v5e 1M-row bank):
        # mxu recovers nibble dots from matmuls whose cost scales with
        # the query-block rows — fastest at small blocks (B=64: 1.00 ms
        # vs vpu 1.30, int8 1.05); the per-byte vpu unpack is
        # B-independent and wins at large blocks (B=256: 2.81 vs mxu
        # 2.89).
        int4_impl = "mxu" if block_b <= 128 else "vpu"
    mode, scale, qn, _ = _resolve_mode(kernel, kernel_params, qfeat, qfeat[:1])
    return _prepared_call(
        qn, prepared, scale,
        mode=mode, n_classes=n_classes, block_b=block_b, interpret=interpret,
        partials=partials, softmax_impl=softmax_impl, fold2=_fold2,
        agg_precision=agg_precision, meta_stream=meta_stream,
        oh_impl=oh_impl, int4_impl=int4_impl, tile_sel=tile_sel,
    )


def nw_fused_partials(
    qfeat: jnp.ndarray,
    sfeat: jnp.ndarray,
    sy: jnp.ndarray,
    n_classes: int,
    *,
    kernel: str = "euclidean",
    kernel_params: Optional[Dict[str, Any]] = None,
    support_mask: Optional[jnp.ndarray] = None,
    block_b: Optional[int] = None,
    block_s: Optional[int] = None,
    interpret: Optional[bool] = None,
    precision: str = "f32",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-shard online-softmax partials via the fused kernel:
    returns ``(m (B, 1), l (B, 1), acc (B, C))`` — the quantities the
    support-sharded distributed merge combines (``parallel.merge_partials``).
    Inference-only (no VJP)."""
    kernel_params = kernel_params or {}
    if support_mask is None:
        support_mask = jnp.ones(sfeat.shape[0], dtype=jnp.float32)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if precision == "bf16":
        qfeat = qfeat.astype(jnp.bfloat16)
        sfeat = sfeat.astype(jnp.bfloat16)
    if block_s is None:
        block_s = _auto_block_s(
            sfeat.shape[0], sfeat.shape[1], sfeat.dtype.itemsize,
            _round_up(n_classes, 128),
        )
    block_s = min(_round_up(block_s, 128), _round_up(sfeat.shape[0], 128))
    if block_b is None:
        block_b = _default_block_b(qfeat.shape[0], n_classes, block_s)
    mode, scale, qn, sn = _resolve_mode(kernel, kernel_params, qfeat, sfeat)
    acc, m, l = _fwd_pallas(
        qn, sn, sy, support_mask.astype(jnp.float32), scale,
        mode=mode, n_classes=n_classes,
        block_b=block_b, block_s=block_s, interpret=interpret, partials=True,
    )
    return m, l, acc


# ---------------------------------------------------------------------------
# Backward kernels (flash-style: recompute tile scores from saved (m, l))
# ---------------------------------------------------------------------------

def _bwd_tile_dscore(scale, q, s, valid_row, oh, u, r, m, l, *, mode):
    """Shared per-tile recompute: returns (dscore (TB, TS), aux) where aux is
    the l2 distance (for the chain rule) or the raw dot (for dscale)."""
    dot = jax.lax.dot_general(
        q, s, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (TB, TS)
    if mode == "l2":
        qf = q.astype(jnp.float32)
        sf = s.astype(jnp.float32)
        q2 = jnp.sum(qf * qf, axis=1, keepdims=True)
        s2 = jnp.sum(sf * sf, axis=1, keepdims=True)
        d2 = jnp.maximum(q2 - 2.0 * dot + s2.T, 0.0)
        dist = jnp.sqrt(d2)
        score = -dist
        aux = dist
    else:
        score = dot * scale
        aux = dot

    score = jnp.where(valid_row, score, _NEG_INF)

    m_safe = jnp.where(m > _NEG_INF / 2, m, 0.0)  # (TB, 1)
    w = jnp.where(
        score > _NEG_INF / 2, jnp.exp(score - m_safe), 0.0
    ) / jnp.maximum(l, 1e-30)  # (TB, TS)

    # u_{i, y_j}: gather via one-hot matmul on the MXU.
    uy = jax.lax.dot_general(
        u, oh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (TB, TS)

    dscore = w * (uy - r)  # (TB, TS)
    return dscore, aux


def _build_onehot(sub_ref, oh_ref, nchunk: int, c_pad: int) -> None:
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (128, c_pad), 1).astype(
        jnp.float32
    )
    for t in range(nchunk):
        col = sub_ref[0, :, t:t + 1]
        oh_ref[t * 128:(t + 1) * 128, :] = (col == col_ids).astype(jnp.float32)


def _valid_row(lane_ref, nchunk: int):
    return jnp.concatenate(
        [lane_ref[0, t:t + 1, :] for t in range(nchunk)], axis=1
    ) >= 0.0


def _nw_bwd_dq_kernel(
    scale_ref, q_ref, s_ref, lane_ref, sub_ref, u_ref, r_ref, m_ref, l_ref,
    dq_ref, acc_ref, oh_ref,
    *, mode: str, n_s_tiles: int, c_pad: int, nchunk: int,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _build_onehot(sub_ref, oh_ref, nchunk, c_pad)
    dscore, aux = _bwd_tile_dscore(
        scale_ref[0, 0], q_ref[:], s_ref[:], _valid_row(lane_ref, nchunk),
        oh_ref[:], u_ref[:], r_ref[:, :1], m_ref[:, :1], l_ref[:, :1],
        mode=mode,
    )
    if mode == "l2":
        # dq_i += sum_j (dscore/d) * (s_j - q_i)
        t = jnp.where(aux > 0.0, dscore / jnp.where(aux > 0.0, aux, 1.0), 0.0)
        ts = jax.lax.dot_general(
            t, s_ref[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TB, D)
        acc_ref[:] += ts - q_ref[:].astype(jnp.float32) * jnp.sum(
            t, axis=1, keepdims=True
        )
    else:
        ds_s = jax.lax.dot_general(
            dscore, s_ref[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] += scale_ref[0, 0] * ds_s

    @pl.when(j == n_s_tiles - 1)
    def _finalize():
        dq_ref[:] = acc_ref[:].astype(dq_ref.dtype)


def _nw_bwd_ds_kernel(
    scale_ref, q_ref, s_ref, lane_ref, sub_ref, u_ref, r_ref, m_ref, l_ref,
    ds_ref, acc_ref, oh_ref,
    *, mode: str, n_b_tiles: int, c_pad: int, nchunk: int,
):
    i = pl.program_id(1)  # batch tiles innermost

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _build_onehot(sub_ref, oh_ref, nchunk, c_pad)
    dscore, aux = _bwd_tile_dscore(
        scale_ref[0, 0], q_ref[:], s_ref[:], _valid_row(lane_ref, nchunk),
        oh_ref[:], u_ref[:], r_ref[:, :1], m_ref[:, :1], l_ref[:, :1],
        mode=mode,
    )
    if mode == "l2":
        # ds_j += sum_i (dscore/d) * (q_i - s_j)
        t = jnp.where(aux > 0.0, dscore / jnp.where(aux > 0.0, aux, 1.0), 0.0)
        tq = jax.lax.dot_general(
            t, q_ref[:].astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TS, D)
        # Column sums as a matmul with a ones vector: (TS, TB) x (TB, 1)
        # — avoids a (1, TS) -> (TS, 1) relayout Mosaic can't do cheaply.
        ones = jnp.ones((t.shape[0], 1), jnp.float32)
        colsum = jax.lax.dot_general(
            t, ones, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (TS, 1)
        acc_ref[:] += tq - s_ref[:].astype(jnp.float32) * colsum
    else:
        dq_t = jax.lax.dot_general(
            dscore, q_ref[:].astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TS, D)
        acc_ref[:] += scale_ref[0, 0] * dq_t

    @pl.when(i == n_b_tiles - 1)
    def _finalize():
        ds_ref[:] = acc_ref[:].astype(ds_ref.dtype)


def _bwd_pallas(
    q, s, sy, mask, scale, u, r, m_stat, l_stat,
    *, mode, n_classes, block_b, block_s, interpret,
):
    B, D0 = q.shape
    S = s.shape[0]
    c_pad = _round_up(n_classes, 128)
    b_pad = _round_up(B, block_b)
    s_pad = _round_up(S, block_s)
    D = _round_up(D0, 128)  # zero feature-padding (gradients of zeros = 0)
    nchunk = block_s // 128

    q_p = jnp.pad(q, ((0, b_pad - B), (0, D - D0)))
    s_p = jnp.pad(s, ((0, s_pad - S), (0, D - D0)))
    if q_p.dtype != s_p.dtype:
        q_p = q_p.astype(s_p.dtype)
    lane, sub = _pack_labels(sy, mask, s_pad, block_s)

    u_p = jnp.pad(u.astype(jnp.float32), ((0, b_pad - B), (0, c_pad - u.shape[1])))
    r_p = jnp.broadcast_to(
        jnp.pad(r.astype(jnp.float32), ((0, b_pad - B), (0, 0))), (b_pad, 128)
    )
    m_p = jnp.broadcast_to(m_stat, (b_pad, 128))
    l_p = jnp.broadcast_to(l_stat, (b_pad, 128))

    n_b = b_pad // block_b
    n_s = s_pad // block_s
    scale2d = scale.reshape(1, 1)
    cparams = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary"),
        vmem_limit_bytes=_VMEM_LIMIT,
    )

    # dq: grid (B tiles, S tiles), S innermost (accumulate over S).
    dq = pl.pallas_call(
        functools.partial(
            _nw_bwd_dq_kernel, mode=mode, n_s_tiles=n_s, c_pad=c_pad,
            nchunk=nchunk,
        ),
        grid=(n_b, n_s),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((block_b, D), lambda i, j: (i, 0)),
            pl.BlockSpec((block_s, D), lambda i, j: (j, 0)),
            pl.BlockSpec((1, nchunk, 128), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((1, 128, nchunk), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((block_b, c_pad), lambda i, j: (i, 0)),
            pl.BlockSpec((block_b, 128), lambda i, j: (i, 0)),
            pl.BlockSpec((block_b, 128), lambda i, j: (i, 0)),
            pl.BlockSpec((block_b, 128), lambda i, j: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block_b, D), lambda i, j: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_b, D), jnp.float32),
            pltpu.VMEM((block_s, c_pad), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((b_pad, D), q.dtype),
        compiler_params=cparams,
        interpret=interpret,
    )(scale2d, q_p, s_p, lane, sub, u_p, r_p, m_p, l_p)[:B, :D0]

    # ds: grid (S tiles, B tiles), B innermost (accumulate over B).
    ds = pl.pallas_call(
        functools.partial(
            _nw_bwd_ds_kernel, mode=mode, n_b_tiles=n_b, c_pad=c_pad,
            nchunk=nchunk,
        ),
        grid=(n_s, n_b),
        in_specs=[
            pl.BlockSpec((1, 1), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((block_b, D), lambda j, i: (i, 0)),
            pl.BlockSpec((block_s, D), lambda j, i: (j, 0)),
            pl.BlockSpec((1, nchunk, 128), lambda j, i: (j, 0, 0)),
            pl.BlockSpec((1, 128, nchunk), lambda j, i: (j, 0, 0)),
            pl.BlockSpec((block_b, c_pad), lambda j, i: (i, 0)),
            pl.BlockSpec((block_b, 128), lambda j, i: (i, 0)),
            pl.BlockSpec((block_b, 128), lambda j, i: (i, 0)),
            pl.BlockSpec((block_b, 128), lambda j, i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block_s, D), lambda j, i: (j, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_s, D), jnp.float32),
            pltpu.VMEM((block_s, c_pad), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((s_pad, D), s.dtype),
        compiler_params=cparams,
        interpret=interpret,
    )(scale2d, q_p, s_p, lane, sub, u_p, r_p, m_p, l_p)[:S, :D0]

    # dscale (clip): for 'dot' mode, score = scale * dot  =>
    # d/dscale = sum_ij dscore_ij dot_ij = <q, dq> / scale (since
    # dq = scale * dscore @ s). For 'l2', scale is unused.
    if mode == "dot":
        dscale = (
            jnp.sum(q.astype(jnp.float32) * dq.astype(jnp.float32)) / scale
        ).astype(scale.dtype)
    else:
        dscale = jnp.zeros_like(scale)
    return dq, ds, dscale


# ---------------------------------------------------------------------------
# Exact chunked reference (kept as a cross-check oracle for the backward)
# ---------------------------------------------------------------------------

def _chunked_probs(q, s, sy_onehot, mask, scale, *, mode, chunk):
    """Online-softmax over support chunks with lax.scan — same math as the
    kernel, differentiable by construction. Returns (probs, weights_fn)."""
    B = q.shape[0]
    S = s.shape[0]
    n_chunks = S // chunk
    C = sy_onehot.shape[1]

    s_c = s.reshape(n_chunks, chunk, -1)
    y_c = sy_onehot.reshape(n_chunks, chunk, C)
    m_c = mask.reshape(n_chunks, chunk)

    def scores_of(sc, mc):
        dot = jnp.einsum("bd,sd->bs", q, sc, precision=jax.lax.Precision.HIGHEST)
        if mode == "l2":
            q2 = jnp.sum(q * q, axis=1, keepdims=True)
            s2 = jnp.sum(sc * sc, axis=1)[None, :]
            d2 = jnp.maximum(q2 - 2.0 * dot + s2, 0.0)
            safe = jnp.where(d2 > 0, d2, 1.0)
            sc_ = -jnp.where(d2 > 0, jnp.sqrt(safe), 0.0)
        else:
            sc_ = dot * scale
        return jnp.where(mc[None, :] > 0, sc_, _NEG_INF)

    def step(carry, xs):
        m_prev, l_prev, acc = carry
        sc, yc, mc = xs
        score = scores_of(sc, mc)
        m_new = jnp.maximum(m_prev, jnp.max(score, axis=1, keepdims=True))
        m_safe = jnp.where(m_new > _NEG_INF / 2, m_new, 0.0)
        alpha = jnp.where(m_prev > _NEG_INF / 2, jnp.exp(m_prev - m_safe), 0.0)
        p = jnp.where(score > _NEG_INF / 2, jnp.exp(score - m_safe), 0.0)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + p @ yc
        return (m_new, l_new, acc), None

    init = (
        jnp.full((B, 1), _NEG_INF, jnp.float32),
        jnp.zeros((B, 1), jnp.float32),
        jnp.zeros((B, C), jnp.float32),
    )
    (m, l, acc), _ = jax.lax.scan(step, init, (s_c, y_c, m_c))
    probs = acc / jnp.maximum(l, 1e-30)
    return probs


# ---------------------------------------------------------------------------
# Public op with custom VJP
# ---------------------------------------------------------------------------


def _resolve_mode(kernel: str, kernel_params: Dict[str, Any], q, s):
    """Reduce the 5 kernel variants to (mode, scale, q', s')."""
    if kernel == "euclidean":
        return "l2", jnp.float32(1.0), q, s
    if kernel == "hypersphere_euclidean":
        return "l2", jnp.float32(1.0), _l2_normalize(q), _l2_normalize(s)
    if kernel == "cosine":
        return "dot", jnp.float32(1.0), _l2_normalize(q), _l2_normalize(s)
    if kernel == "dotproduct":
        return "dot", jnp.float32(1.0), q, s
    if kernel == "clip":
        scale = jnp.exp(kernel_params["logit_scale"]).astype(jnp.float32)
        return "dot", scale, _l2_normalize(q), _l2_normalize(s)
    raise NotImplementedError(f"fused kernel does not support {kernel!r}")


def nw_fused_log_probs(
    qfeat: jnp.ndarray,
    sfeat,
    sy: Optional[jnp.ndarray] = None,
    n_classes: Optional[int] = None,
    *,
    kernel: str = "euclidean",
    kernel_params: Optional[Dict[str, Any]] = None,
    support_mask: Optional[jnp.ndarray] = None,
    block_b: Optional[int] = None,
    block_s: Optional[int] = None,
    interpret: Optional[bool] = None,
    precision: Optional[str] = None,
    softmax_impl: str = "exp",
    oh_impl: Optional[str] = None,
) -> jnp.ndarray:
    """Fused NW head: ``log(softmax(kernel(q, s)) @ onehot(sy) + 1e-12)``.

    Same contract as ``nw_log_probs`` restricted to 2-D shared support.
    Differentiable wrt q, s, and clip's logit_scale.

    ``sfeat`` may be a ``PreparedSupport`` (then ``sy`` is ignored) — the
    inference-only serving path with zero per-call bank preparation.

    precision: 'f32' (exact, default) or 'bf16' (cast features to bf16 —
    half the HBM traffic and a single-pass MXU dot; log-prob error ~1e-2,
    fine for throughput-critical serving, not for calibration-sensitive
    eval).
    """
    if isinstance(sfeat, PreparedSupport):
        if n_classes is None:
            raise ValueError("n_classes is required with a PreparedSupport")
        if support_mask is not None:
            raise ValueError(
                "support_mask must be baked in at prepare_support time "
                "(the prepared bank's labels already encode the mask)"
            )
        bank_precision = {
            jnp.dtype(jnp.float32): "f32",
            jnp.dtype(jnp.bfloat16): "bf16",
            jnp.dtype(jnp.int8): "int8",
            jnp.dtype(jnp.uint8): "int4",  # nibble-packed marker dtype
        }[jnp.dtype(sfeat.s.dtype)]
        if precision is not None and precision != bank_precision:
            raise ValueError(
                f"precision={precision!r} but the prepared bank is "
                f"{bank_precision} — pass precision= to prepare_support instead"
            )
        kwargs = {} if oh_impl is None else {"oh_impl": oh_impl}
        return nw_fused_from_prepared(
            qfeat, sfeat, n_classes,
            kernel=kernel, kernel_params=kernel_params,
            block_b=block_b, interpret=interpret,
            softmax_impl=softmax_impl, **kwargs,
        )
    if softmax_impl != "exp":
        raise ValueError(
            "softmax_impl is a prepared-bank serving option; the raw-array "
            "(differentiable) path always uses the guarded exp"
        )
    if oh_impl is not None:
        raise ValueError(
            "oh_impl is a prepared-bank serving option; the raw-array "
            "path builds its one-hot from the compact label pair"
        )
    kernel_params = kernel_params or {}
    if support_mask is None:
        support_mask = jnp.ones(sfeat.shape[0], dtype=jnp.float32)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if (precision or "f32") == "bf16":
        # Bandwidth-optimized inference: bf16 features halve HBM traffic and
        # run the distance dot in one MXU pass; softmax stats stay f32.
        qfeat = qfeat.astype(jnp.bfloat16)
        sfeat = sfeat.astype(jnp.bfloat16)

    if block_b is None:  # avoid padding small batches up to a huge tile
        block_b = min(128, _round_up(qfeat.shape[0], 8))
    if block_s is None:
        block_s = _auto_block_s(
            sfeat.shape[0], sfeat.shape[1], sfeat.dtype.itemsize,
            _round_up(n_classes, 128),
        )
    block_s = min(_round_up(block_s, 128), _round_up(sfeat.shape[0], 128))
    mode, scale, qn, sn = _resolve_mode(kernel, kernel_params, qfeat, sfeat)
    return _nw_fused_core(
        qn,
        sn,
        scale,
        sy,
        support_mask.astype(jnp.float32),
        mode,
        n_classes,
        block_b,
        block_s,
        interpret,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _nw_fused_core(q, s, scale, sy, mask, mode, n_classes, block_b, block_s, interpret):
    out, _, _ = _fwd_pallas(
        q,
        s,
        sy,
        mask,
        scale,
        mode=mode,
        n_classes=n_classes,
        block_b=block_b,
        block_s=block_s,
        interpret=interpret,
    )
    return out


def _core_fwd(q, s, scale, sy, mask, mode, n_classes, block_b, block_s, interpret):
    out, m_stat, l_stat = _fwd_pallas(
        q, s, sy, mask, scale,
        mode=mode, n_classes=n_classes,
        block_b=block_b, block_s=block_s, interpret=interpret,
    )
    return out, (q, s, scale, sy, mask, out, m_stat, l_stat)


def _core_bwd(mode, n_classes, block_b, block_s, interpret, residuals, g):
    """Flash-style backward: recompute tile scores from the saved softmax
    stats (m, l) in two Pallas kernels (dq and ds), one pass each."""
    q, s, scale, sy, mask, out, m_stat, l_stat = residuals
    # out = log(o + eps)  =>  dL/do = g * exp(-out) (exact);
    # r_i = sum_c u_ic * o_ic with o = exp(out) - eps.
    u = g * jnp.exp(-out)
    r = jnp.sum(u * (jnp.exp(out) - LOG_FLOOR), axis=-1, keepdims=True)

    dq, ds, dscale = _bwd_pallas(
        q, s, sy, mask, scale, u, r, m_stat, l_stat,
        mode=mode, n_classes=n_classes,
        block_b=block_b, block_s=block_s, interpret=interpret,
    )
    return dq, ds, dscale, None, None


_nw_fused_core.defvjp(_core_fwd, _core_bwd)
