"""Kernel lab: decompose + optimize the fused NW forward kernel on TPU.

Measures, at the CUB headline shape (B=64, S=5994, D=512, C=200, f32):
  * achievable HBM streaming bandwidth (calibration),
  * a cost decomposition of the current kernel (stream -> +dist -> +labels
    -> full),
  * candidate optimizations: uint8 / compact label layouts, split-precision
    (bf16x3) distance matmul, split-p bf16 label-aggregate matmul, tile-size
    sweep.

Each variant is checked for numerical agreement with the naive op before
timing. Run on the TPU only (single-client tunnel!).
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


# --------------------------------------------------------------------------
# timing (same differential method as bench.py: forces host readback,
# cancels the ~30ms tunnel round-trip)
# --------------------------------------------------------------------------

def _differential_time(make_loop, n1, n2, args, repeats=5):
    f1, f2 = make_loop(n1), make_loop(n2)
    float(f1(*args))
    float(f2(*args))
    diffs = []
    for _ in range(repeats):
        t = time.perf_counter()
        float(f1(*args))
        t1 = time.perf_counter() - t
        t = time.perf_counter()
        float(f2(*args))
        t2 = time.perf_counter() - t
        diffs.append(max((t2 - t1) / (n2 - n1), 1e-9))
    return sorted(diffs)[len(diffs) // 2]


def time_fn(fn, args, n1=100, n2=500):
    """fn(*args, carry=acc scalar) -> scalar-ish; returns seconds/call.

    The loop-carried dependency goes through lax.optimization_barrier —
    ``x + 0.0 * carry`` alone gets constant-folded by XLA, hoisting the
    measured computation out of the loop entirely (observed: 'faster than
    the HBM roofline' results)."""

    def make(n):
        @jax.jit
        def run(*a):
            def body(i, acc):
                a_b = jax.lax.optimization_barrier((*a, acc))
                return acc + fn(*a_b[:-1], carry=a_b[-1])

            return jax.lax.fori_loop(0, n, body, jnp.zeros(())).mean()

        return run

    return _differential_time(make, n1, n2, args)


# --------------------------------------------------------------------------
# bandwidth calibration: pure streaming reduce over the bank
# --------------------------------------------------------------------------

def _stream_kernel(s_ref, out_ref, acc_ref, *, n_tiles, touch_only):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if touch_only:  # DMA-cost-only: read 8 sublanes of the block
        acc_ref[:] += s_ref[0:8, :].astype(jnp.float32)
    else:
        acc_ref[:] += jnp.sum(s_ref[:], axis=0, keepdims=True).astype(jnp.float32)

    @pl.when(j == n_tiles - 1)
    def _():
        out_ref[:] = acc_ref[:]


def stream_reduce(s, block_s, touch_only=False):
    S, D = s.shape
    n = S // block_s
    rows = 8 if touch_only else 1
    return pl.pallas_call(
        functools.partial(_stream_kernel, n_tiles=n, touch_only=touch_only),
        grid=(n,),
        in_specs=[pl.BlockSpec((block_s, D), lambda j: (j, 0))],
        out_specs=pl.BlockSpec((rows, D), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rows, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )(s)


# --------------------------------------------------------------------------
# parameterized fused fwd kernel
#   labels: 'wide'    -> (S,128) broadcast, bf16          (current)
#           'wide_u8' -> (S,128) broadcast, uint8 (255 = invalid)
#           'compact' -> lane-major (S/128,128) f32 + sublane-major
#                        (128, S/128) f32 (~zero HBM traffic)
#           'none'    -> synthetic labels (j%C), no mask (upper bound)
#   dist:   'f32'     -> f32 dot (current)
#           'x3'      -> bank passed as (bf16 hi, bf16 lo), 3 bf16 dots;
#                        s2 passed precomputed compact lane-major
#   agg:    'f32'     -> f32 p @ onehot (current)
#           'split'   -> p split hi/lo bf16, onehot bf16, 2 bf16 dots
# --------------------------------------------------------------------------

_PREC = {
    "default": None,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def _make_kernel(*, labels, dist, agg, block_s, c_pad, n_s_tiles, nchunk,
                 mm_prec="default", agg_prec="default"):
    mmp = _PREC[mm_prec]
    aggp = _PREC[agg_prec]
    def kernel(*refs):
        i = 0
        q_ref = refs[i]; i += 1
        if dist == "x3":
            sh_ref = refs[i]; i += 1
            sl_ref = refs[i]; i += 1
            s2_ref = refs[i]; i += 1
        elif dist in ("f32s2", "skip"):
            s_ref = refs[i]; i += 1
            s2_ref = refs[i]; i += 1
        else:
            s_ref = refs[i]; i += 1
        if labels in ("wide", "wide_u8"):
            sy_ref = refs[i]; i += 1
        elif labels == "compact":
            lane_ref = refs[i]; i += 1
            sub_ref = refs[i]; i += 1
        out_ref = refs[i]; i += 1
        m_ref = refs[i]; i += 1
        l_ref = refs[i]; i += 1
        acc_ref = refs[i]; i += 1
        oh_ref = refs[i] if labels == "compact" else None

        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        q = q_ref[:]
        if dist == "skip":
            # Timing-only: no distance matmul; fake scores from s2.
            s = s_ref[:]
            s2row = jnp.concatenate(
                [s2_ref[0, t:t + 1, :] for t in range(nchunk)], axis=1
            )
            touch = jnp.sum(s[0:1, 0:1].astype(jnp.float32))
            score = jnp.broadcast_to(-s2row, (q.shape[0], block_s)) + touch
        elif dist == "f32s2":
            # f32 dot, but the bank self-norm s2 arrives precomputed
            # (lane-major compact per tile) instead of being re-reduced
            # from the (TS, D) tile every call.
            s = s_ref[:]
            dot = jax.lax.dot_general(
                q, s, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
                precision=mmp,
            )
            qf = q.astype(jnp.float32)
            q2 = jnp.sum(qf * qf, axis=1, keepdims=True)
            s2row = jnp.concatenate(
                [s2_ref[0, t:t + 1, :] for t in range(nchunk)], axis=1
            )  # (1, TS)
            d2 = jnp.maximum(q2 - 2.0 * dot + s2row, 0.0)
            score = -jnp.sqrt(d2)
        elif dist == "x3":
            qf = q.astype(jnp.float32)
            qh = qf.astype(jnp.bfloat16)
            ql = (qf - qh.astype(jnp.float32)).astype(jnp.bfloat16)
            sh = sh_ref[:]
            sl = sl_ref[:]
            dn = (((1,), (1,)), ((), ()))
            dot = jax.lax.dot_general(qh, sh, dn, preferred_element_type=jnp.float32)
            dot += jax.lax.dot_general(ql, sh, dn, preferred_element_type=jnp.float32)
            dot += jax.lax.dot_general(qh, sl, dn, preferred_element_type=jnp.float32)
            q2 = jnp.sum(qf * qf, axis=1, keepdims=True)
            # s2 arrives precomputed, lane-major compact (1,nchunk,128) f32
            # per tile; assemble the (1, TS) row from tiny static slices.
            s2row = jnp.concatenate(
                [s2_ref[0, t:t + 1, :] for t in range(nchunk)], axis=1
            )
            d2 = jnp.maximum(q2 - 2.0 * dot + s2row, 0.0)
            score = -jnp.sqrt(d2)
        else:
            s = s_ref[:]
            dot = jax.lax.dot_general(
                q, s, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
                precision=mmp,
            )
            qf = q.astype(jnp.float32)
            sf = s.astype(jnp.float32)
            q2 = jnp.sum(qf * qf, axis=1, keepdims=True)
            s2 = jnp.sum(sf * sf, axis=1, keepdims=True)
            d2 = jnp.maximum(q2 - 2.0 * dot + s2.T, 0.0)
            score = -jnp.sqrt(d2)

        # -- masking + labels column (TS, 1) ------------------------------
        if labels == "wide":
            lab_col = sy_ref[:, :1].astype(jnp.float32)  # (TS,1)
            valid_row = lab_col.T >= 0.0
            score = jnp.where(valid_row, score, _NEG_INF)
        elif labels == "wide_u8":
            lab_col = sy_ref[:, :1].astype(jnp.int32).astype(jnp.float32)
            valid_row = lab_col.T < 254.5
            score = jnp.where(valid_row, score, _NEG_INF)
        elif labels == "compact":
            # Build the (1, TS) valid row from tiny (1,128) slices, then one
            # full-width select (cheaper than per-chunk selects + big concat).
            valid_row = jnp.concatenate(
                [lane_ref[0, t:t + 1, :] for t in range(nchunk)], axis=1
            ) >= 0.0
            score = jnp.where(valid_row, score, _NEG_INF)

        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(score, axis=1, keepdims=True))
        m_safe = jnp.where(m_new > _NEG_INF / 2, m_new, 0.0)
        alpha = jnp.where(m_prev > _NEG_INF / 2, jnp.exp(m_prev - m_safe), 0.0)
        p = jnp.where(score > _NEG_INF / 2, jnp.exp(score - m_safe), 0.0)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)

        # -- one-hot construction -----------------------------------------
        if labels in ("wide", "wide_u8"):
            col_ids = jax.lax.broadcasted_iota(
                jnp.int32, (block_s, c_pad), 1
            ).astype(jnp.float32)
            onehot = (lab_col == col_ids).astype(jnp.float32)
        elif labels == "compact":
            col_ids = jax.lax.broadcasted_iota(
                jnp.int32, (128, c_pad), 1
            ).astype(jnp.float32)
            dt = jnp.bfloat16 if agg == "split" else jnp.float32
            for t in range(nchunk):
                col = sub_ref[0, :, t:t + 1]  # (128,1) f32, static slice
                oh_ref[t * 128:(t + 1) * 128, :] = (col == col_ids).astype(dt)
            onehot = oh_ref[:]
        else:  # 'none': synthetic labels j % c_pad -> onehot is tiled identity
            col_ids = jax.lax.broadcasted_iota(jnp.int32, (block_s, c_pad), 1)
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (block_s, c_pad), 0)
            onehot = (row_ids % c_pad == col_ids).astype(jnp.float32)

        if agg == "skip":  # timing-only: no label-aggregate matmul
            pv = p[:, :c_pad] + jnp.sum(onehot[0:1, 0:1].astype(jnp.float32))
        elif agg == "split":
            if labels != "compact":
                onehot = onehot.astype(jnp.bfloat16)
            ph = p.astype(jnp.bfloat16)
            plo = (p - ph.astype(jnp.float32)).astype(jnp.bfloat16)
            dn = (((1,), (0,)), ((), ()))
            pv = jax.lax.dot_general(ph, onehot, dn, preferred_element_type=jnp.float32)
            pv += jax.lax.dot_general(plo, onehot, dn, preferred_element_type=jnp.float32)
        else:
            pv = jax.lax.dot_general(
                p, onehot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=aggp,
            )
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

        @pl.when(j == n_s_tiles - 1)
        def _fin():
            l_final = jnp.maximum(l_ref[:, :1], 1e-30)
            out_ref[:] = jnp.log(acc_ref[:] / l_final + 1e-12)

    return kernel


def fused_variant(q, s, sy, n_classes, *, labels="wide", dist="f32",
                  agg="f32", block_s=2048, block_b=None, cast="f32",
                  mm_prec="default", agg_prec="default"):
    if cast == "bf16":
        q = q.astype(jnp.bfloat16)
        s = s.astype(jnp.bfloat16)
    B, D0 = q.shape
    S = s.shape[0]
    c_pad = _round_up(n_classes, 128)
    if block_b is None:
        block_b = min(128, _round_up(B, 8))
    b_pad = _round_up(B, block_b)
    s_pad = _round_up(S, block_s)
    D = _round_up(D0, 128)
    nchunk = block_s // 128

    q_p = jnp.pad(q, ((0, b_pad - B), (0, D - D0)))
    s_p = jnp.pad(s, ((0, s_pad - S), (0, D - D0)))

    sy_i = jnp.pad(sy.astype(jnp.int32), (0, s_pad - S), constant_values=-1)

    inputs = [q_p]
    in_specs = [pl.BlockSpec((block_b, D), lambda i, j: (i, 0))]

    if dist == "x3":
        sh = s_p.astype(jnp.bfloat16)
        sl = (s_p - sh.astype(jnp.float32)).astype(jnp.bfloat16)
        s2 = jnp.sum(s_p.astype(jnp.float32) ** 2, axis=1)  # (s_pad,)
        s2c = s2.reshape(s_pad // block_s, nchunk, 128)
        inputs += [sh, sl, s2c]
        in_specs += [
            pl.BlockSpec((block_s, D), lambda i, j: (j, 0)),
            pl.BlockSpec((block_s, D), lambda i, j: (j, 0)),
            pl.BlockSpec((1, nchunk, 128), lambda i, j: (j, 0, 0)),
        ]
    elif dist in ("f32s2", "skip"):
        s2 = jnp.sum(s_p.astype(jnp.float32) ** 2, axis=1)
        s2c = s2.reshape(s_pad // block_s, nchunk, 128)
        inputs += [s_p, s2c]
        in_specs += [
            pl.BlockSpec((block_s, D), lambda i, j: (j, 0)),
            pl.BlockSpec((1, nchunk, 128), lambda i, j: (j, 0, 0)),
        ]
    else:
        inputs += [s_p]
        in_specs += [pl.BlockSpec((block_s, D), lambda i, j: (j, 0))]

    if labels == "wide":
        syw = jnp.broadcast_to(
            sy_i.astype(jnp.bfloat16)[:, None], (s_pad, 128)
        )
        inputs += [syw]
        in_specs += [pl.BlockSpec((block_s, 128), lambda i, j: (j, 0))]
    elif labels == "wide_u8":
        syw = jnp.broadcast_to(
            jnp.where(sy_i < 0, 255, sy_i).astype(jnp.uint8)[:, None],
            (s_pad, 128),
        )
        inputs += [syw]
        in_specs += [pl.BlockSpec((block_s, 128), lambda i, j: (j, 0))]
    elif labels == "compact":
        # lane-major (n_tiles, nchunk, 128) and sublane-major
        # (n_tiles, 128, nchunk) per-tile label blocks (~zero HBM traffic).
        lane = sy_i.astype(jnp.float32).reshape(s_pad // block_s, nchunk, 128)
        sub = jnp.transpose(lane, (0, 2, 1))
        inputs += [lane, sub]
        in_specs += [
            pl.BlockSpec((1, nchunk, 128), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((1, 128, nchunk), lambda i, j: (j, 0, 0)),
        ]

    n_b = b_pad // block_b
    n_s = s_pad // block_s

    scratch = [
        pltpu.VMEM((block_b, 128), jnp.float32),
        pltpu.VMEM((block_b, 128), jnp.float32),
        pltpu.VMEM((block_b, c_pad), jnp.float32),
    ]
    if labels == "compact":
        dt = jnp.bfloat16 if agg == "split" else jnp.float32
        scratch.append(pltpu.VMEM((block_s, c_pad), dt))

    kernel = _make_kernel(
        labels=labels, dist=dist, agg=agg, block_s=block_s,
        c_pad=c_pad, n_s_tiles=n_s, nchunk=nchunk,
        mm_prec=mm_prec, agg_prec=agg_prec,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_b, n_s),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_b, c_pad), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b_pad, c_pad), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(*inputs)
    return out[:B, :n_classes]


def interleaved_time(named_makers, n1=200, n2=2200, cycles=7):
    """Round-robin differential timing across variants: one (n1, n2) sample
    per variant per cycle, median over cycles. Immune to the slow clock /
    thermal drift that makes back-to-back runs disagree by ~20%."""
    fns = {}
    for name, make, args in named_makers:
        f1, f2 = make(n1), make(n2)
        float(f1(*args)); float(f2(*args))  # compile + warm
        fns[name] = (f1, f2, args)
    samples = {name: [] for name, _, _ in named_makers}
    for _ in range(cycles):
        for name, (f1, f2, args) in fns.items():
            t = time.perf_counter(); float(f1(*args)); t1 = time.perf_counter() - t
            t = time.perf_counter(); float(f2(*args)); t2 = time.perf_counter() - t
            samples[name].append(max((t2 - t1) / (n2 - n1), 1e-9))
    for name, v in samples.items():
        print(f"  [{name}] " + " ".join(f"{x*1e6:.1f}" for x in sorted(v)), flush=True)
    return {
        name: sorted(v)[len(v) // 2] for name, v in samples.items()
    }


def _loop_maker(fn, n):
    @jax.jit
    def run(*a):
        def body(i, acc):
            a_b = jax.lax.optimization_barrier((*a, acc))
            return acc + fn(*a_b[:-1], carry=a_b[-1])

        return jax.lax.fori_loop(0, n, body, jnp.zeros(())).mean()

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--interleave", action="store_true")
    args = ap.parse_args()

    print("device:", jax.devices()[0].device_kind, flush=True)
    B, S, D, C = 64, 5994, 512, 200
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    bank = jnp.asarray(rng.standard_normal((S, D)).astype(np.float32))
    sy = jnp.asarray(rng.integers(0, C, size=S).astype(np.int32))

    from nwhead_tpu.ops.nw import nw_log_probs
    ref = np.asarray(nw_log_probs(q, bank, sy, C))

    if args.interleave:
        s_big = jnp.asarray(rng.standard_normal((12288, D)).astype(np.float32))

        def variant_maker(v):
            return lambda n: _loop_maker(
                lambda qq, ss, carry: fused_variant(
                    qq + 0.0 * carry, ss, sy, C, **v
                ).mean(),
                n,
            )

        cases = [
            (
                "stream touch bs=2048 (25.2MB)",
                lambda n: _loop_maker(
                    lambda s, carry: stream_reduce(s + 0.0 * carry, 2048, True).mean(), n
                ),
                (s_big,),
            ),
        ]
        for v in [
            dict(labels="compact", dist="f32s2", agg="f32", block_s=2048),
            dict(labels="compact", dist="skip", agg="f32", block_s=2048),
            dict(labels="compact", dist="f32s2", agg="skip", block_s=2048),
            dict(labels="compact", dist="skip", agg="skip", block_s=2048),
            dict(labels="none", dist="skip", agg="skip", block_s=2048),
            dict(labels="compact", dist="f32s2", agg="f32", block_s=2048,
                 cast="bf16"),
            dict(labels="compact", dist="skip", agg="skip", block_s=2048,
                 cast="bf16"),
        ]:
            name = (
                f"{v['labels']:7s} {v['dist']:5s} agg={v['agg']:5s} "
                f"bs={v['block_s']:<5d} {v.get('cast','f32')} "
                f"mm={v.get('mm_prec','def')}"
            )
            if "skip" not in (v["dist"], v["agg"]) and v["labels"] != "none":
                out = np.asarray(fused_variant(q, bank, sy, C, **v))
                err = float(np.max(np.abs(out - ref) / (np.abs(ref) + 1e-6)))
                print(f"  relerr {name}: {err:.2e}", flush=True)
            cases.append((name, variant_maker(dict(v)), (q, bank)))

        # Bandwidth-bound operating point: tiny batch, compute << DMA.
        q8 = q[:8]
        for v in [
            dict(labels="compact", dist="f32s2", agg="f32", block_s=2048),
            dict(labels="compact", dist="f32s2", agg="f32", block_s=1024),
            dict(labels="compact", dist="f32s2", agg="f32", block_s=2048,
                 cast="bf16"),
        ]:
            name = (
                f"B=8 {v['labels']:7s} {v['dist']:5s} bs={v['block_s']:<5d} "
                f"{v.get('cast','f32')}"
            )
            cases.append((name, variant_maker(dict(v)), (q8, bank)))

        res = interleaved_time(cases)
        t_stream = res.pop("stream touch bs=2048 (25.2MB)")
        bw = s_big.size * 4 / t_stream / 1e9
        print(f"stream: {t_stream*1e6:7.1f} us  {bw:6.1f} GB/s", flush=True)
        floor_f32 = S * D * 4 / (bw * 1e9)
        for name, t in res.items():
            frac_meas = floor_f32 / t
            print(
                f"{name}: {t*1e6:7.1f} us  frac_vs_stream={frac_meas:5.3f} "
                f"frac_vs_819={S*D*4/819e9/t:5.3f}",
                flush=True,
            )
        return

    # --- bandwidth calibration ------------------------------------------
    s_big = jnp.asarray(
        rng.standard_normal((12288, D)).astype(np.float32)
    )  # 25.2 MB
    for bs, touch in ((2048, False), (1024, True), (2048, True), (4096, True)):
        t = time_fn(
            lambda s, carry, _bs=bs, _to=touch: stream_reduce(
                s + 0.0 * carry, _bs, _to
            ).mean(),
            (s_big,),
        )
        gbs = s_big.size * 4 / t / 1e9
        print(
            f"stream f32 block_s={bs} touch={touch}: {t*1e6:8.1f} us  {gbs:7.1f} GB/s",
            flush=True,
        )

    # --- current kernel (library) ---------------------------------------
    from nwhead_tpu.ops.pallas_nw import nw_fused_log_probs
    t = time_fn(
        lambda qq, ss, carry: nw_fused_log_probs(
            qq + 0.0 * carry, ss, sy, C
        ).mean(),
        (q, bank),
    )
    print(f"library current f32:        {t*1e6:8.1f} us   (r1: 28.1)", flush=True)

    variants = [
        dict(labels="compact", dist="f32s2", agg="f32", block_s=512),
        dict(labels="compact", dist="f32s2", agg="f32", block_s=768),
        dict(labels="compact", dist="f32s2", agg="f32", block_s=1024),
        dict(labels="compact", dist="f32s2", agg="f32", block_s=1536),
        dict(labels="compact", dist="f32s2", agg="f32", block_s=1024),  # repeat
        dict(labels="compact", dist="f32s2", agg="f32", block_s=512),   # repeat
        dict(labels="compact", dist="f32s2", agg="f32", block_s=1024, cast="bf16"),
        dict(labels="compact", dist="f32s2", agg="f32", block_s=2048, cast="bf16"),
    ]
    if args.quick:
        variants = variants[:4]

    for v in variants:
        name = (
            f"labels={v['labels']:8s} dist={v['dist']:5s} agg={v['agg']:5s} "
            f"bs={v['block_s']} cast={v.get('cast', 'f32')}"
        )
        try:
            out = np.asarray(fused_variant(q, bank, sy, C, **v))
            if v["labels"] == "none":
                err = float("nan")
            else:
                err = float(np.max(np.abs(out - ref) / (np.abs(ref) + 1e-6)))
            t = time_fn(
                lambda qq, ss, carry, _v=v: fused_variant(
                    qq + 0.0 * carry, ss, sy, C, **_v
                ).mean(),
                (q, bank),
            )
            bw = S * D * 4 / t / 1e9
            frac = (S * D * 4 / 819e9) / t
            print(
                f"{name}: {t*1e6:8.1f} us  roofline_frac={frac:5.3f} "
                f"({bw:6.1f} GB/s-equiv)  relerr={err:.2e}",
                flush=True,
            )
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
