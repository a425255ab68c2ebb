"""Lab: full-mode NW inference over a MILLION-item support bank on ONE chip.

The reference keeps the precomputed feature bank on host CPU and ships it
to the device per predict call (``/root/reference/nwhead/nw.py:226,156``),
so its full-mode support size is bounded by host->device bandwidth and the
materialized (B, S) score matrix. This framework's design goal is the
opposite regime: the prepared bank is HBM-resident and the fused kernel
streams it through VMEM with online softmax, so S scales with chip HBM
(SURVEY §2.5 SP/CP row). This lab demonstrates that at S = 1,000,000
(512-dim f32 bank = 2.05 GB; int8 = 0.51 GB), C = 1000 (the C > 256
int32 label branch):

  * validation leg (S = 131072 default): prepared f32/bf16/int8 heads vs
    the exact streaming online-softmax oracle (``nw/streaming.py``, host
    chunks) — catches indexing/masking bugs that only appear past the
    sizes the unit tests cover;
  * scale leg (S = 1e6): interleaved differential timing of the prepared
    heads at B=64/256 against an in-process stream calibration; reports
    us/batch, queries/sec, and the HBM-roofline fraction, plus an
    f32-vs-int8 top-1 agreement rate as an at-scale consistency check.

Run on the chip: ``python scripts/bigbank_lab.py``; CPU smoke:
``python scripts/bigbank_lab.py --tiny`` (interpret-mode kernels).

``--hnsw`` adds the host-ANN comparison leg: the reference's answer to
large banks is approximate NN on the host (``nwhead/utils.py:195-216``);
this leg builds the first-party C++ HNSW (same M/efC) over an
``--hnsw_s``-row slice, measures build time / query rate / recall@k vs a
host brute force, and contrasts with the exact full-mode head's on-chip
rate over the FULL bank.
"""

import argparse
import functools
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)


def _stream_case(D):
    """In-process HBM stream calibration (same kernel as bench.py)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s_big = jnp.asarray(
        np.random.default_rng(7).standard_normal((12288, D)).astype(np.float32)
    )

    def _kernel(s_ref, out_ref, acc_ref, *, n_tiles):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += s_ref[0:8, :]

        @pl.when(j == n_tiles - 1)
        def _():
            out_ref[:] = acc_ref[:]

    def stream(s, carry):
        s = s + 0.0 * carry
        n = s.shape[0] // 2048
        return pl.pallas_call(
            functools.partial(_kernel, n_tiles=n),
            grid=(n,),
            in_specs=[pl.BlockSpec((2048, D), lambda j: (j, 0))],
            out_specs=pl.BlockSpec((8, D), lambda j: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, D), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, D), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)
            ),
        )(s).mean()

    return stream, s_big


def _gen_bank(S, D, C, seed=0):
    """Device-side bank synthesis: class-clustered features (centroid +
    noise) so top-1 agreement between precisions is a meaningful check
    (pure noise would make argmax a coin flip among 1000 classes).

    The 0.1 scale keeps squared distances O(10), not O(1000): MXU DEFAULT
    precision carries ~3e-4 relative error, so O(1000) scores get ~0.3
    ABSOLUTE log-space error on chip (first on-chip run measured exactly
    that) — no tight oracle gate can hold at that magnitude, while O(10)
    score gaps still concentrate the softmax for a meaningful top-1."""
    import jax
    import jax.numpy as jnp

    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(seed), 3)
    sy = jax.random.randint(k0, (S,), 0, C, dtype=jnp.int32)
    cents = 0.1 * jax.random.normal(k1, (C, D), jnp.float32)

    @jax.jit
    def build(sy):
        noise = jax.random.normal(k2, (S, D), jnp.float32)
        return cents[sy] + 0.05 * noise

    return build(sy), sy, cents


def _hnsw_leg(bank_np, sy_np, q_np, k):
    """The reference's big-bank strategy, measured: host-side approximate
    NN (``nwhead/utils.py:195-216`` — hnswlib; here the first-party C++
    index with the same M=16/efC=100 parameters) vs this framework's
    exact full-mode head. Returns (queries/sec, recall@k)."""
    import time

    from nwhead_tpu.native.hnsw import HNSWIndex

    Sh = bank_np.shape[0]
    print(f"[hnsw] building C++ HNSW over S={Sh} (M=16, efC=100, one host "
          f"core)...", flush=True)
    t0 = time.perf_counter()
    idx = HNSWIndex(bank_np, sy_np, n_neighbors=k)
    build_s = time.perf_counter() - t0
    print(f"[hnsw] build {build_s:.1f} s ({Sh / build_s:.0f} rows/s)",
          flush=True)

    idx.knn_query(q_np)  # warm
    reps, t0 = 5, time.perf_counter()
    for _ in range(reps):
        ids = idx.knn_query(q_np)
    qdt = (time.perf_counter() - t0) / reps
    qps = q_np.shape[0] / qdt

    # Exact ground truth: chunked host brute force (blockwise so the
    # (B, chunk) distance matrix stays small).
    qn = (q_np.astype(np.float64) ** 2).sum(1)[:, None]
    ids_parts, d_parts = [], []
    for i in range(0, Sh, 65536):
        blk = bank_np[i:i + 65536].astype(np.float64)
        d = qn - 2.0 * q_np.astype(np.float64) @ blk.T + (blk ** 2).sum(1)[None]
        part = np.argpartition(d, k - 1, axis=1)[:, :k]
        ids_parts.append(part + i)
        d_parts.append(np.take_along_axis(d, part, 1))
    ids_all = np.concatenate(ids_parts, 1)
    sel = np.argpartition(np.concatenate(d_parts, 1), k - 1, 1)[:, :k]
    true_ids = np.take_along_axis(ids_all, sel, 1)
    recall = float(np.mean([
        len(set(ids[b].tolist()) & set(true_ids[b].tolist())) / k
        for b in range(q_np.shape[0])
    ]))
    print(f"[hnsw] query rate {qps:.0f} q/s (B={q_np.shape[0]}, k={k}, one "
          f"host core)  recall@{k} {recall:.3f}", flush=True)
    return qps, recall


def _giant_leg(S, D, C, B, on_tpu, tiny=False, precision="int8", ivf=False,
               block_s=0):
    """Beyond-f32-memory banks: chunked int8 prepare + concat_prepared.

    The standard scale leg materializes the f32 bank (4·S·D bytes) before
    quantizing, capping S at ~1-2M rows on a 16 GB chip. Here each chunk is
    generated, prepared at int8, and merged tile-wise (``concat_prepared``
    — per-chunk class sort keeps the C > 128 aggregation windows), so the
    resident bank is S·D bytes: S = 8M rows of D=512 is a 4 GB bank, 8x the
    reference-style f32 ceiling and ~1300x the reference's actual CUB bank.
    Functional gate: queries drawn at each cluster centroid must classify
    to their generating class (the bank is cluster-separated by
    construction; int8 rounding does not move a 2-sigma margin)."""
    import jax
    import jax.numpy as jnp

    from timing import interleaved_time

    from nwhead_tpu.ops.pallas_nw import (
        _default_block_b, concat_prepared, nw_fused_log_probs,
        prepare_support,
    )

    if not block_s:
        # The tile size must be chosen for the FINAL bank size, not the
        # chunk size (chunked builds inherit the first part's tile):
        # _serving_block_s is the scale-aware default (2048/4096 past the
        # giant threshold — the per-tile DMA issue amortization win).
        from nwhead_tpu.ops.pallas_nw import _serving_block_s

        block_s = _serving_block_s(S)
    # IVF builds halve the chunk: the per-chunk transients (f32 chunk +
    # prepare temps + the centroid reduction's workspace) sit on top of
    # the accumulated packed parts, and the first 8M ivf attempt at 1M
    # chunks hit RESOURCE_EXHAUSTED.
    chunk = 4096 if tiny else (1 << 19 if ivf else 1 << 20)
    kc, key = jax.random.split(jax.random.PRNGKey(5))
    cents = 0.1 * jax.random.normal(kc, (C, D), jnp.float32)

    @functools.partial(jax.jit, static_argnums=(1,))
    def gen(k, n):
        ky, kn = jax.random.split(k)
        sy = jax.random.randint(ky, (n,), 0, C, dtype=jnp.int32)
        if ivf:
            # Generate each chunk ALREADY class-sorted so the IVF
            # builder's permutation is the identity and its full-chunk
            # gather copies are skipped (the OOM lesson above).
            sy = jnp.sort(sy)
        return cents[sy] + 0.05 * jax.random.normal(kn, (n, D), jnp.float32), sy

    bank_ivf = None
    parts = []
    for i in range(0, S, chunk):
        n = min(chunk, S - i)
        feats, sy = gen(jax.random.fold_in(key, i), n)
        if ivf:
            # Each chunk is class-sorted internally by prepare_support_ivf,
            # so its tiles are routable; concat_ivf stacks tiles AND
            # centroids (a class split across chunks just owns tiles in
            # several chunks — routing ranks them all).
            from nwhead_tpu.ops.ivf import prepare_support_ivf

            parts.append(prepare_support_ivf(
                feats, sy, C, precision=precision, block_s=block_s))
        else:
            parts.append(prepare_support(
                feats, sy, C, precision=precision, block_s=block_s))
        del feats, sy
    if ivf:
        from nwhead_tpu.ops.ivf import concat_ivf, nw_fused_ivf_log_probs

        bank_ivf = concat_ivf(parts, C)
        prep = bank_ivf.prep
    else:
        prep = concat_prepared(parts, C)
    del parts
    jax.block_until_ready(prep.s)
    win_w = 0 if prep.win is None else prep.win.shape[1] * 128
    gbytes = S * D * (0.5 if precision == "int4" else 1) / 1e9
    print(f"[giant] {precision} bank S={S} D={D} C={C}: {gbytes:.2f} GB "
          f"resident ({len(range(0, S, chunk))} chunks, window W={win_w})",
          flush=True)

    # Functional gate: one query per class AT its centroid.
    rng = np.random.default_rng(2)
    q_cls = rng.permutation(C)[: max(B, 64)].astype(np.int32)
    q = jnp.asarray(cents)[jnp.asarray(q_cls)]
    out = np.asarray(nw_fused_log_probs(q, prep, None, C))
    agree = float((out.argmax(1) == q_cls).mean())
    status = "OK " if agree == 1.0 else "FAIL"
    print(f"  {status} centroid-query top-1 = generating class: "
          f"{agree:.3f}", flush=True)

    q_skew = None
    if bank_ivf is not None:
        # Routed gate: skewed queries (8 active classes) at n_probe=4 —
        # same generating-class criterion through the pruned path.
        active = rng.permutation(C)[:8].astype(np.int32)
        skew_cls = rng.choice(active, max(B, 256)).astype(np.int32)
        q_skew = jnp.asarray(np.asarray(jnp.asarray(cents))[skew_cls])
        out_r = np.asarray(nw_fused_ivf_log_probs(
            q_skew[:64], bank_ivf, C, n_probe=4))
        agree_r = float((out_r.argmax(1) == skew_cls[:64]).mean())
        status_r = "OK " if agree_r == 1.0 else "FAIL"
        print(f"  {status_r} routed (n_probe=4) skew-query top-1: "
              f"{agree_r:.3f}", flush=True)

    if not on_tpu:
        print("not on TPU: skipping giant timing leg")
        return

    def head_fn(qq, pp, carry):
        qq = jax.lax.optimization_barrier(qq + carry.astype(qq.dtype) * 1e-30)
        return nw_fused_log_probs(qq, pp, None, C).mean() * 1e-20

    stream, s_big = _stream_case(D)
    q256 = jnp.asarray(rng.standard_normal((256, D)).astype(np.float32))
    cases = [
        ("stream 25.2MB", stream, (s_big,)),
        (f"giant B=64 {precision}", head_fn, (q[:64], prep)),
        (f"giant B=256 {precision}", head_fn, (q256, prep)),
    ]
    if bank_ivf is not None:
        def ivf_fn(qq, bb, carry):
            qq = jax.lax.optimization_barrier(
                qq + carry.astype(qq.dtype) * 1e-30)
            return nw_fused_ivf_log_probs(
                qq, bb, C, n_probe=4).mean() * 1e-20

        cases += [
            (f"giant ivf-p4 B=64 {precision} skew", ivf_fn,
             (q_skew[:64], bank_ivf)),
            (f"giant ivf-p4 B=256 {precision} skew", ivf_fn,
             (q_skew[:256], bank_ivf)),
        ]
    res = interleaved_time(cases, cycles=7, target_s=0.5)
    t_stream = res.pop("stream 25.2MB")
    bw = s_big.size * 4 / t_stream / 1e9
    print(f"stream: {t_stream * 1e6:7.1f} us  {bw:6.1f} GB/s", flush=True)
    for name, t in res.items():
        nq = 256 if "B=256" in name else 64
        if "ivf" in name:
            # Pruned DMA: the full-bank roofline fraction is meaningless.
            print(f"{name}: {t * 1e3:8.3f} ms/batch  {nq / t:9.0f} q/s",
                  flush=True)
            continue
        blk = _default_block_b(nq, C, prep.lane.shape[1] * 128)
        byt = int(S * D * (0.5 if precision == "int4" else 1)) * (
            -(-nq // blk))
        print(f"{name}: {t * 1e3:8.3f} ms/batch  {nq / t:9.0f} q/s "
              f"frac_vs_stream={(byt / (bw * 1e9)) / t:5.3f} "
              f"frac_vs_819={byt / 819e9 / t:5.3f}", flush=True)


def _stream_host_leg(S, D, C, B, chunk=65536):
    """Host-resident bank through ``nw_streaming_log_probs`` — the third
    regime (bank exceeds device HBM; ``nw/streaming.py``, ancestor
    ``legacy/model/net.py:53-72``). Every call ships the WHOLE bank over
    the host->device link, so qps = link_bytes_per_s / bank_bytes * B —
    this leg measures that constant and states the regime boundary
    against the HBM-resident heads (round-5 verdict #7)."""
    import time as _time

    import jax
    import jax.numpy as jnp

    from nwhead_tpu.nw.streaming import nw_streaming_log_probs

    rng = np.random.default_rng(9)
    cents = rng.standard_normal((C, D)).astype(np.float32)
    sy = rng.integers(0, C, S).astype(np.int32)
    bank = (cents[sy] + 0.5 * rng.standard_normal((S, D))).astype(
        np.float32)
    q = jnp.asarray(
        cents[rng.integers(0, C, B)]
        + 0.1 * rng.standard_normal((B, D)), jnp.float32)

    def chunks():
        for i in range(0, S, chunk):
            yield bank[i:i + chunk], sy[i:i + chunk]

    out = nw_streaming_log_probs(q, chunks(), C, chunk_size=chunk)
    float(out.sum())  # warm: compile + one full link pass
    t0 = _time.perf_counter()
    out = nw_streaming_log_probs(q, chunks(), C, chunk_size=chunk)
    float(out.sum())
    wall = _time.perf_counter() - t0
    gb = S * D * 4 / 1e9
    mbps = S * D * 4 / wall / 1e6
    qps = B / wall
    # Extrapolation is linear in bank bytes (the link is the wall).
    q16m = B / (16e6 * D * 4 / (mbps * 1e6))
    print(f"[stream_host] S={S} ({gb:.2f} GB host f32), B={B}, "
          f"chunk={chunk}: {wall:.1f} s/batch -> {qps:.3f} q/s "
          f"(link {mbps:.1f} MB/s; extrapolated 16M-row f32 bank "
          f"{q16m:.4f} q/s)", flush=True)
    print("[stream_host] regime boundary: host streaming wins only when "
          "the bank cannot fit HBM at ANY precision and no mesh is "
          "available; on this link the HBM int8/int4 heads are ~1e4-1e5x "
          "faster per byte of bank", flush=True)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--S", type=int, default=1_000_000)
    p.add_argument("--S_check", type=int, default=131_072,
                   help="validation-leg bank size (streaming oracle)")
    p.add_argument("--D", type=int, default=512)
    p.add_argument("--C", type=int, default=1000)
    p.add_argument("--tiny", action="store_true",
                   help="CPU smoke: S=4096/S_check=2048, C=300, B=8")
    p.add_argument("--hnsw", action="store_true",
                   help="host-ANN leg: build the first-party C++ HNSW over "
                        "an --hnsw_s-row slice of the bank (the reference's "
                        "big-bank strategy, nwhead/utils.py:195-216), "
                        "measure build time / query rate / recall@k vs "
                        "exact, against the exact full-mode head")
    p.add_argument("--hnsw_s", type=int, default=131_072,
                   help="HNSW leg bank size (single-core build is ~250 "
                        "rows/s at D=512 — 1e6 rows would take ~1 h)")
    p.add_argument("--hnsw_k", type=int, default=10)
    p.add_argument("--giant_precision", default="int8",
                   choices=["int8", "int4"],
                   help="giant-leg bank precision: int4 fits 2x the rows "
                        "in the same HBM (16M x 512 = 4.1 GB)")
    p.add_argument("--giant", type=int, default=0,
                   help="rows for the chunked-build int8 giant-bank leg "
                        "(e.g. 8000000): the f32 bank never materializes — "
                        "1M-row chunks are generated, int8-prepared, and "
                        "merged via concat_prepared, so S is bounded by the "
                        "INT8 bank bytes (S/4 GB at D=512), not 4S. 0 = off")
    p.add_argument("--giant_block_s", type=int, default=0,
                   help="bank tile rows for the giant build; 0 = the "
                        "scale-aware default (_serving_block_s: 2048/4096 past "
                        "the giant threshold — cuts per-tile DMA ramp + "
                        "fixed costs)")
    p.add_argument("--giant_ivf", action="store_true",
                   help="build the giant bank with per-chunk IVF indexes "
                        "(prepare_support_ivf + concat_ivf) and add routed "
                        "skew-batch gates + timing legs")
    p.add_argument("--stream_host", type=int, default=0,
                   help="rows for the host-resident streaming leg "
                        "(nw/streaming.py): the whole bank crosses the "
                        "host->device link per batch — measures the link "
                        "constant + the regime boundary. 0 = off")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from timing import interleaved_time

    from nwhead_tpu.nw.streaming import nw_streaming_log_probs
    from nwhead_tpu.ops.pallas_nw import nw_fused_log_probs, prepare_support

    if args.tiny:
        args.S, args.S_check, args.C = 4096, 2048, 300
        if args.giant:
            args.giant = min(args.giant, 8192)
    S, D, C = args.S, args.D, args.C
    B = 8 if args.tiny else 64
    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.default_rng(1)

    if args.stream_host:
        _stream_host_leg(args.stream_host, D, C, B,
                         chunk=min(65536, args.stream_host))
        return

    if args.giant:
        _giant_leg(args.giant, D, C, B, on_tpu, tiny=args.tiny,
                   block_s=args.giant_block_s,
                   precision=args.giant_precision, ivf=args.giant_ivf)
        return

    # ---- validation leg: prepared heads vs the exact streaming oracle ----
    Sv = args.S_check
    bank_v, sy_v, cents = _gen_bank(Sv, D, C)
    # Queries from the SAME class-cluster distribution as the bank (not
    # pure noise): a noise query equidistant from two centroids has its
    # argmax legitimately flipped by bf16/int8 rounding, which is lossy-
    # precision behavior, not a bug signal.
    q_cls = rng.integers(0, C, size=B)
    q = jnp.asarray(cents)[jnp.asarray(q_cls)] + 0.05 * jnp.asarray(
        rng.standard_normal((B, D)).astype(np.float32)
    )
    chunk = 16384 if Sv >= 16384 else Sv
    chunks = (
        (np.asarray(bank_v[i : i + chunk]), np.asarray(sy_v[i : i + chunk]))
        for i in range(0, Sv, chunk)
    )
    oracle = np.asarray(nw_streaming_log_probs(q, chunks, C))
    # Gates are in PROBABILITY space (max |exp(out) - exp(oracle)|) +
    # top-1 agreement. Log-space relerr is ill-conditioned at BOTH ends —
    # losing classes sit at the log(1e-12) floor, and the winning class
    # sits near log(1)=0 where a ~1e-3 denominator turns a benign 0.04
    # log shift (prob 0.999 -> 0.956) into a "44x" relerr (exactly what
    # the first on-chip run of this lab printed for all three legs, with
    # 1.000 top-1 agreement). f32's gate absorbs MXU DEFAULT-precision
    # rounding (~3e-4 relative on scores; interpret-mode CPU runs read
    # ~1e-6); the lossy gates absorb expected bank-rounding shifts.
    tols = {"f32": 2e-2, "bf16": 5e-2, "int8": 1e-1, "int4": 2e-1}
    for prec, tol in tols.items():
        prep = prepare_support(bank_v, sy_v, C, precision=prec)
        out = np.asarray(nw_fused_log_probs(q, prep, None, C))
        err = float(np.max(np.abs(np.exp(out) - np.exp(oracle))))
        kind = "max prob err"
        agree = float((out.argmax(1) == oracle.argmax(1)).mean())
        # f32 must match the oracle's argmax exactly; lossy banks are
        # allowed a near-tie flip or two (expected quantization behavior).
        min_agree = 1.0 if prec == "f32" else 1.0 - 2.0 / B
        status = "OK " if err < tol and agree >= min_agree else "FAIL"
        print(f"  {status} S={Sv} {prec}: {kind} vs streaming-oracle "
              f"{err:.2e}  top1-agree {agree:.3f}", flush=True)
    del bank_v, sy_v, prep

    # ---- scale leg ----
    bank, sy, cents_s = _gen_bank(S, D, C, seed=3)
    gb = S * D * 4 / 1e9
    print(f"bank: S={S} D={D} C={C}  raw f32 {gb:.2f} GB", flush=True)
    preps = {prec: prepare_support(bank, sy, C, precision=prec)
             for prec in ("f32", "bf16", "int8", "int4")}
    bank_np = sy_np = None
    if args.hnsw:
        Sh = min(args.hnsw_s, S)
        bank_np = np.asarray(bank[:Sh])
        sy_np = np.asarray(sy[:Sh])
    del bank  # keep only the prepared banks resident

    # Queries from THIS bank's cluster distribution (seed=3 centroids, not
    # the validation leg's) so the cross-precision agreement check isn't
    # dominated by near-tie noise queries.
    q = jnp.asarray(cents_s)[jnp.asarray(rng.integers(0, C, size=B))] + (
        0.05 * jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    )

    out32 = np.asarray(nw_fused_log_probs(q, preps["f32"], None, C))
    for prec in ("bf16", "int8", "int4"):
        out = np.asarray(nw_fused_log_probs(q, preps[prec], None, C))
        agree = float((out.argmax(1) == out32.argmax(1)).mean())
        print(f"  at-scale f32-vs-{prec}: top1 agreement {agree:.3f}",
              flush=True)

    hnsw_qps = None
    if args.hnsw:
        # Host leg runs BEFORE the device timing loop so its numpy brute
        # force doesn't contend with the interleaved harness's host side.
        hnsw_qps, _ = _hnsw_leg(bank_np, sy_np, np.asarray(q), args.hnsw_k)

    if not on_tpu and not args.tiny:
        print("not on TPU: skipping timing leg")
        return
    if args.tiny:
        print("tiny smoke OK")
        return

    # The bank rides as a loop ARG (interleaved_time barriers all args):
    # closing over a 2 GB prepared bank inlines it as HLO constants and
    # the remote compile service rejects the body (the 413 lesson).
    def head_fn(qq, prep, carry):
        qq = jax.lax.optimization_barrier(qq + carry.astype(qq.dtype) * 1e-30)
        return nw_fused_log_probs(qq, prep, None, C).mean() * 1e-20

    stream, s_big = _stream_case(D)
    q256 = jnp.asarray(rng.standard_normal((256, D)).astype(np.float32))
    cases = [("stream 25.2MB", stream, (s_big,))]
    for prec, prep in preps.items():
        cases.append((f"head B=64 {prec}", head_fn, (q, prep)))
    cases.append(("head B=256 int8", head_fn, (q256, preps["int8"])))
    cases.append(("head B=256 int4", head_fn, (q256, preps["int4"])))

    res = interleaved_time(cases, cycles=7, target_s=0.3)
    t_stream = res.pop("stream 25.2MB")
    bw = s_big.size * 4 / t_stream / 1e9
    print(f"stream: {t_stream * 1e6:7.1f} us  {bw:6.1f} GB/s", flush=True)
    from nwhead_tpu.ops.pallas_nw import _default_block_b

    bytes_per = {"f32": S * D * 4, "bf16": S * D * 2, "int8": S * D,
                 "int4": S * D // 2}
    int8_qps = None
    for name, t in res.items():
        prec = name.split()[-1]
        nq = 256 if "B=256" in name else B
        # One bank stream per query tile: since the whole-batch-tile
        # default, B<=512 is ONE pass (the old hardcoded 2-passes-at-B=256
        # overstated the B=256 roofline fraction 2x).
        blk = _default_block_b(nq, C, preps[prec].lane.shape[1] * 128)
        byt = bytes_per[prec] * (-(-nq // blk))
        if name == "head B=256 int8":
            int8_qps = nq / t
        print(
            f"{name}: {t * 1e3:8.3f} ms/batch  {nq / t:9.0f} q/s "
            f"frac_vs_stream={(byt / (bw * 1e9)) / t:5.3f} "
            f"frac_vs_819={byt / 819e9 / t:5.3f}",
            flush=True,
        )
    if hnsw_qps and int8_qps:
        print(
            f"[hnsw] exact int8 full-mode head over S={S} answers "
            f"{int8_qps:.0f} q/s on-chip vs {hnsw_qps:.0f} q/s for the "
            f"host HNSW over S={bank_np.shape[0]} "
            f"({int8_qps / hnsw_qps:.0f}x, and exact — approximate NN is "
            f"the reference's big-bank strategy; a many-core host scales "
            f"the ANN side linearly but starts ~{int8_qps / hnsw_qps:.0f}x "
            f"behind on one core)",
            flush=True,
        )


if __name__ == "__main__":
    main()
