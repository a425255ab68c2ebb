"""On-chip A/B of the prepared kernel's aggregation-matmul precision.

``agg_precision='bf16'`` vs ``'f32'`` (current default), one process,
interleaved differential timing (CLAUDE.md rules). The hypothesis from the
whole-batch-tile decomposition: at block_b >= 256 the label-aggregation
matmul ``p @ onehot`` is the kernel's dominant MXU term (TB x TS x cw f32
MACs per tile — bigger than the int8 score dot at the same shapes), so
running it with bf16 inputs (f32 MXU accumulate; the one-hot is EXACT in
bf16, only p picks up 2^-9 rounding) should lift the large-B throughput
plateau for reduced-precision banks. At B=64 the p-cast overhead loses —
that is the round-3 bf16-agg negative result this lab re-scopes.

Parity probe: prob-space (class sums average many rounded terms, measured
~4e-5 max prob diff on CPU interpret; the top-1 must agree).
"""

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from timing import interleaved_time  # noqa: E402
from fold_lab import device_bank  # noqa: E402
from nwhead_tpu.ops.pallas_nw import nw_fused_from_prepared, prepare_support  # noqa: E402


def parity_probe(q, prep, C, kernel):
    f32 = np.asarray(nw_fused_from_prepared(
        q, prep, C, kernel=kernel, agg_precision="f32"))
    b16 = np.asarray(nw_fused_from_prepared(
        q, prep, C, kernel=kernel, agg_precision="bf16"))
    err = np.abs(np.exp(b16) - np.exp(f32)).max()
    agree = (f32.argmax(1) == b16.argmax(1)).mean()
    print(f"  parity {kernel}: max prob diff {err:.2e}  top1 {agree:.3f}",
          flush=True)
    assert err <= 3e-3 and agree == 1.0, (err, agree)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", choices=["cub", "big", "both"], default="both")
    ap.add_argument("--precisions", default="f32,bf16,int8")
    ap.add_argument("--kernel", default="euclidean")
    ap.add_argument("--batches", default="64,256,512,1024")
    ap.add_argument("--cycles", type=int, default=7)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    scales = []
    if args.scale in ("cub", "both"):
        scales.append(("cub", 5994, 200, 512))
    if args.scale in ("big", "both"):
        scales.append(("big", 1_000_000, 1000, 512))

    for tag, S, C, D in scales:
        sfeat, sy = device_bank(S, C, D)
        jax.block_until_ready(sfeat)
        print(f"[{tag}] bank built on device: S={S} C={C} D={D}", flush=True)
        for prec in args.precisions.split(","):
            prep = prepare_support(sfeat, sy, C, kernel=args.kernel,
                                   precision=prec)
            jax.block_until_ready(jax.tree.leaves(prep))
            for B in (int(b) for b in args.batches.split(",")):
                q = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
                if tag == "cub":
                    parity_probe(q, prep, C, args.kernel)

                def mk(ap_):
                    def fn(q_, prep_, carry):
                        out = nw_fused_from_prepared(
                            q_, prep_, C, kernel=args.kernel,
                            agg_precision=ap_)
                        return out.sum() * 1e-6
                    return fn

                res = interleaved_time(
                    [("f32agg", mk("f32"), (q, prep)),
                     ("b16agg", mk("bf16"), (q, prep))],
                    cycles=args.cycles,
                )
                print(
                    f"{tag} {prec} B={B}: f32agg {res['f32agg'] * 1e3:.3f} ms"
                    f" ({B / res['f32agg']:8.0f} q/s)  "
                    f"b16agg {res['b16agg'] * 1e3:.3f} ms"
                    f" ({B / res['b16agg']:8.0f} q/s)  "
                    f"({res['f32agg'] / res['b16agg']:.3f}x)",
                    flush=True,
                )


if __name__ == "__main__":
    main()
