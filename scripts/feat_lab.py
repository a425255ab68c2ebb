"""Featurizer lab: where does ResNet-18 (bf16, B=64, 224x224) time go on
the TPU, and what does the space-to-depth stem buy?"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from scripts.kernel_lab import interleaved_time, _loop_maker
from nwhead_tpu.models import load_model


def main():
    from nwhead_tpu.models.resnet import BasicBlock, ResNet

    B, IMG = 64, 224
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, IMG, IMG, 3)).astype(np.float32))
    x_bf16 = x.astype(jnp.bfloat16)
    x256 = jnp.asarray(rng.standard_normal((256, IMG, IMG, 3)).astype(np.float32))

    cases = []

    def add(name, m, xx):
        v = m.init(jax.random.PRNGKey(0), xx[:1], train=False)
        cases.append((
            name,
            lambda n, _m=m: _loop_maker(
                lambda vv, q, carry: _m.apply(vv, q, train=False).mean(), n
            ),
            (v, xx),
        ))

    # Cumulative stage truncations (bf16): stem -> +layer1 -> ... -> full.
    for name, layers in [
        ("stem only      ", (0, 0, 0, 0)),
        ("stem+l1        ", (2, 0, 0, 0)),
        ("stem+l1+l2     ", (2, 2, 0, 0)),
        ("stem+l1+l2+l3  ", (2, 2, 2, 0)),
        ("full bf16      ", (2, 2, 2, 2)),
    ]:
        add(name, ResNet(block=BasicBlock, layers=layers, dtype=jnp.bfloat16), x)

    add("full bf16 input", ResNet(block=BasicBlock, layers=(2, 2, 2, 2), dtype=jnp.bfloat16), x_bf16)
    add("full B=256     ", ResNet(block=BasicBlock, layers=(2, 2, 2, 2), dtype=jnp.bfloat16), x256)

    res = interleaved_time(cases, n1=20, n2=120, cycles=7)
    prev = 0.0
    for name, t in res.items():
        bsz = 256 if "256" in name else 64
        extra = f"  (+{(t-prev)*1e3:6.3f} ms)" if "stem" in name or name.startswith("full bf16  ") else ""
        print(f"{name}: {t*1e3:7.3f} ms/batch{bsz}  ({bsz/t:,.0f} img/s){extra}", flush=True)
        prev = t

    t = res["full bf16      "]
    util = (64 * 1.82e9 * 2) / 197e12 / t
    print(f"full bf16 MXU utilization ~ {util*100:.1f}% of 197 TFLOPs", flush=True)


if __name__ == "__main__":
    main()
