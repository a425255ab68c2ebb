"""Shared honest-timing harness for the TPU labs.

CLAUDE.md timing rules distilled: the loop-carried dependency rides
``lax.optimization_barrier`` (a bare ``x + 0.0 * carry`` gets constant-
folded and the measured computation hoisted); time = (loop(n2) - loop(n1))
/ (n2 - n1) so fixed dispatch/readback overhead cancels; per-variant
iteration counts are auto-calibrated so the delta carries >= ``target_s``
seconds of signal (the axon tunnel jitter is ~30 ms); variants are sampled
round-robin (back-to-back runs disagree by ~10-20% from clock drift).

For XLA ops (convs/matmuls) remember the algebraic-folding traps recorded
in scripts/quant_lab.py: barrier the measured op's INPUTS after any carry
injection AND its OUTPUT before any reduction (conv/matmul are linear —
XLA distributes sums through them and hoists the op out of the loop).

``scripts/kernel_lab.py`` keeps its own fixed-(n1, n2) variant for
reproducibility of the round-2 head-kernel records.
"""

import time

import jax
import jax.numpy as jnp


def _loop_maker(fn, n):
    @jax.jit
    def run(*a):
        def body(i, acc):
            a_b = jax.lax.optimization_barrier((*a, acc))
            return acc + fn(*a_b[:-1], carry=a_b[-1])

        return jax.lax.fori_loop(0, n, body, jnp.zeros(())).mean()

    return run


def interleaved_time(named_makers, cycles=7, target_s=0.06, return_samples=False):
    """Auto-calibrated interleaved differential timing.

    named_makers: [(name, fn(*args, carry) -> tiny scalar, args)].
    Returns {name: seconds_per_iteration} (median over cycles).
    """
    fns = {}
    for name, fn, args in named_makers:
        # Differential probe: a single absolute timing of a 64-iter loop
        # is dominated by the ~30 ms axon tunnel round trip for us-scale
        # ops, which inflates t_est and shrinks the measurement delta
        # below the jitter floor. Estimate the per-iteration slope from
        # two loop lengths instead.
        p1, p2 = _loop_maker(fn, 64), _loop_maker(fn, 256)
        float(p1(*args)); float(p2(*args))  # compile
        t0 = time.perf_counter(); float(p1(*args))
        t64 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(p2(*args))
        t256 = time.perf_counter() - t0
        t_est = max((t256 - t64) / 192, 1e-8)
        delta = min(max(int(target_s / t_est), 64), 65536)
        n1, n2 = 16, 16 + delta
        f1, f2 = _loop_maker(fn, n1), _loop_maker(fn, n2)
        float(f1(*args)); float(f2(*args))
        fns[name] = (f1, f2, args, delta)
    samples = {name: [] for name, _, _ in named_makers}
    for _ in range(cycles):
        for name, (f1, f2, args, delta) in fns.items():
            t = time.perf_counter(); float(f1(*args)); t1 = time.perf_counter() - t
            t = time.perf_counter(); float(f2(*args)); t2 = time.perf_counter() - t
            samples[name].append(max((t2 - t1) / delta, 1e-9))
    med = {name: sorted(v)[len(v) // 2] for name, v in samples.items()}
    if return_samples:
        return med, samples
    return med
