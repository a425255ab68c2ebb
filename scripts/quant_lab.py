"""Lab: is an int8 featurizer viable on v5e via XLA?

The e2e full-mode serving headline is featurizer-dominated (ResNet-18 bf16
B=64@224 = 2.59 ms vs 18.5 us head). v5e's MXU runs int8 at 2x bf16
throughput (394 vs 197 TOPS) — if XLA lowers s8xs8->s32 convs to that path,
a post-training-quantized serving featurizer is the single biggest e2e
lever left.

Measures per-conv-shape timings f32 vs bf16 vs int8 on the real TPU with the
differential interleaved-loop methodology (CLAUDE.md timing rules: the
loop-carried dependency rides lax.optimization_barrier; time = (loop(n2) -
loop(n1)) / (n2 - n1); variants sampled round-robin).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def _loop_maker(fn, n):
    @jax.jit
    def run(*a):
        def body(i, acc):
            a_b = jax.lax.optimization_barrier((*a, acc))
            return acc + fn(*a_b[:-1], carry=a_b[-1])

        return jax.lax.fori_loop(0, n, body, jnp.zeros(())).mean()

    return run


def interleaved_time(named_makers, n1=5, n2=45, cycles=7):
    fns = {}
    for name, fn, args in named_makers:
        f1, f2 = _loop_maker(fn, n1), _loop_maker(fn, n2)
        float(f1(*args)); float(f2(*args))
        fns[name] = (f1, f2, args)
    samples = {name: [] for name, _, _ in named_makers}
    for _ in range(cycles):
        for name, (f1, f2, args) in fns.items():
            t = time.perf_counter(); float(f1(*args)); t1 = time.perf_counter() - t
            t = time.perf_counter(); float(f2(*args)); t2 = time.perf_counter() - t
            samples[name].append(max((t2 - t1) / (n2 - n1), 1e-9))
    return {name: sorted(v)[len(v) // 2] for name, v in samples.items()}


def conv(x, w, stride, preferred=None):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred,
    )


def main():
    rng = np.random.default_rng(0)
    B = 64
    shapes = [
        ("stem7x7s2", 224, 224, 3, 64, 7, 2),
        ("l1_3x3", 56, 56, 64, 64, 3, 1),
        ("l2_3x3", 28, 28, 128, 128, 3, 1),
        ("l3_3x3", 14, 14, 256, 256, 3, 1),
        ("l4_3x3", 7, 7, 512, 512, 3, 1),
    ]
    print(f"backend={jax.default_backend()} B={B}", flush=True)
    for name, H, W, Cin, Cout, k, stride in shapes:
        x = rng.standard_normal((B, H, W, Cin)).astype(np.float32)
        w = (rng.standard_normal((k, k, Cin, Cout)) * 0.05).astype(np.float32)
        xj, wj = jnp.asarray(x), jnp.asarray(w)
        xb, wb = xj.astype(jnp.bfloat16), wj.astype(jnp.bfloat16)
        x8 = jnp.clip(jnp.round(xj * 10), -127, 127).astype(jnp.int8)
        w8 = jnp.clip(jnp.round(wj * 100), -127, 127).astype(jnp.int8)

        # carry folds into the input so each iteration re-runs the conv.
        def f32_fn(xx, ww, carry, s=stride):
            out = conv(xx + carry.astype(xx.dtype), ww, s)
            return jnp.sum(out.astype(jnp.float32)) * 1e-20

        def bf16_fn(xx, ww, carry, s=stride):
            out = conv(xx + carry.astype(xx.dtype), ww, s)
            return jnp.sum(out.astype(jnp.float32)) * 1e-20

        def int8_fn(xx, ww, carry, s=stride):
            # int8 carry injection: flip by a data-dependent 0/1.
            dx = (carry > 1e30).astype(jnp.int8)
            out = conv(xx + dx, ww, s, preferred=jnp.int32)
            return jnp.sum(out.astype(jnp.float32)) * 1e-20

        makers = [("f32", f32_fn, (xj, wj)), ("bf16", bf16_fn, (xb, wb))]
        try:
            jax.jit(lambda a, b: conv(a, b, stride, jnp.int32)).lower(
                x8, w8
            ).compile()
            makers.append(("int8", int8_fn, (x8, w8)))
        except Exception as e:  # noqa: BLE001
            print(f"  {name}: int8 conv UNSUPPORTED: {type(e).__name__}: {e}",
                  flush=True)
        res = interleaved_time(makers)
        flops = 2 * B * (H // stride) * (W // stride) * k * k * Cin * Cout
        line = "  ".join(
            f"{n}={t * 1e6:7.1f}us ({flops / t / 197e12 * 100:4.1f}%)"
            for n, t in res.items()
        )
        print(f"  {name}: {line}", flush=True)


if __name__ == "__main__":
    main()
