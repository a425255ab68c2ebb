"""On-chip IVF-pruned serving lab: pruned bank DMA vs the exact head.

The exact prepared head streams the WHOLE bank per query tile — at 1M
rows that is 0.70 ms of int8 DMA per call plus an S-scaled VPU score
chain. mode='ivf' (ops/ivf.py) streams only the union of each batch's
top-``n_probe`` routed tiles, so both terms scale with the union size.
The union is a BATCH property: uniform-random queries over many classes
route to most of the bank at large B (no win by design — the subset
softmax needs those tiles), while concentrated batches (real serving
skew: a handful of active classes per batch) prune deeply. This lab
measures both regimes, with top-1 agreement vs the exact head as the
recall gate, at f32 and int8, B=64/256.

Run on the chip (single-client tunnel!): python scripts/ivf_lab.py
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from timing import interleaved_time  # noqa: E402
from nwhead_tpu.ops import (  # noqa: E402
    nw_fused_from_prepared,
    nw_fused_ivf_log_probs,
    prepare_support_ivf,
)


def real_curve(args):
    """Agreement-vs-n_probe on REAL overlapping features (round-5 verdict
    #3): synthetic separated-gaussian banks answer 1.000 at tiny n_probe,
    which says nothing about routing on features whose class clusters
    overlap. 'digits' = sklearn's bundled handwritten digits, raw 64-d
    pixel features (real data, heavy overlap); 'synthetic_cub' = the
    CUB-shaped training set featurized by resnet18 (512-d). Prints the
    agreement/prob-diff/union curve and the ivf_auto_config choice at
    three targets."""
    from nwhead_tpu.ops import ivf_auto_config

    if args.real == "digits":
        from sklearn.datasets import load_digits

        X, y = load_digits(return_X_y=True)
        X = (X / 16.0).astype(np.float32)
        n_train = 1500
        sf, sy = X[:n_train], y[:n_train].astype(np.int32)
        q = X[n_train:]
        C = 10
        # 128-row tiles by default (1500 rows at 1024 would be 2 tiles —
        # no curve to see); an EXPLICIT --block_s is honored.
        block_s = args.block_s if args.block_s else 128
    else:  # synthetic_cub features through resnet18
        sys.path.insert(0, "/root/repo")
        import train as train_cli
        from nwhead_tpu.models import load_model

        ns = argparse.Namespace(dataset="synthetic_cub", data_dir="",
                                seed=0, workers=0, decoder="auto")
        train_ds, val_ds = train_cli.build_datasets(ns)
        model = load_model("resnet18", dtype=jnp.bfloat16)
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(train_ds.gather(np.arange(1))), train=False)
        feat = jax.jit(lambda v, x: model.apply(v, x, train=False))

        def featurize(ds, n):
            outs = []
            for i in range(0, n, 128):
                idx = np.arange(i, min(i + 128, n))
                outs.append(np.asarray(feat(
                    variables, jnp.asarray(ds.gather(idx)))))
            return np.concatenate(outs).astype(np.float32)

        n_bank = min(len(train_ds), 5994)
        sf = featurize(train_ds, n_bank)
        sy = np.asarray(train_ds.targets[:n_bank], np.int32)
        q = featurize(val_ds, min(len(val_ds), 512))
        C = train_ds.num_classes
        # 256-row tiles by default: 5994 rows at 1024 is 6 tiles — too
        # coarse for a curve; an EXPLICIT --block_s is honored.
        block_s = args.block_s if args.block_s else 256
    sf = jnp.asarray(sf)
    sy = jnp.asarray(sy)
    q = jnp.asarray(q, jnp.float32)
    ivf = prepare_support_ivf(sf, sy, C, kernel=args.kernel,
                              block_s=block_s)
    n_tiles = int(ivf.prep.lane.shape[0])
    exact = np.asarray(nw_fused_from_prepared(
        q, ivf.prep, C, kernel=args.kernel))
    # Serving-sized query batches: at B >> n_tiles the whole-batch union
    # covers the bank and every n_probe is trivially exact — the honest
    # per-query recall curve routes each SMALL batch independently (and
    # that is what a deployed server does).
    bs = args.real_batch
    nq = q.shape[0] - (q.shape[0] % bs)
    print(f"[{args.real}] S={sf.shape[0]} C={C} D={sf.shape[1]} "
          f"queries={nq} (batches of {bs}) n_tiles={n_tiles}", flush=True)
    for p in (1, 2, 3, 4, 6, 8, 12, 16, 24, 32):
        if p > n_tiles:
            break
        agrees, pds = [], []
        for i in range(0, nq, bs):
            out = np.asarray(nw_fused_ivf_log_probs(
                q[i:i + bs], ivf, C, kernel=args.kernel, n_probe=p))
            agrees.append(
                (out.argmax(1) == exact[i:i + bs].argmax(1)).mean())
            pds.append(np.abs(np.exp(out)
                              - np.exp(exact[i:i + bs])).max())
        print(f"  n_probe={p:3d}: top-1 agree {np.mean(agrees):.4f}  "
              f"max prob diff {np.max(pds):.2e}", flush=True)
    for target in (0.99, 0.999, 1.0):
        cfg = ivf_auto_config(q[:bs], ivf, C, kernel=args.kernel,
                              target_agree=target)
        print(f"  auto(target={target}, B={bs}): n_probe={cfg.n_probe} "
              f"group_b={cfg.group_b} agree {cfg.agreement:.4f} "
              f"diversity {cfg.route_diversity}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--real", choices=["digits", "synthetic_cub"],
                    default=None,
                    help="agreement-vs-n_probe curve on real overlapping "
                         "features instead of the synthetic timing bank")
    ap.add_argument("--real_batch", type=int, default=32,
                    help="--real: serve queries in batches of this size "
                         "(per-query recall; whole-set batches cover the "
                         "bank trivially)")
    ap.add_argument("--s", type=int, default=1_000_000)
    ap.add_argument("--c", type=int, default=1000)
    ap.add_argument("--d", type=int, default=512)
    ap.add_argument("--kernel", default="euclidean")
    ap.add_argument("--precisions", default="int8,f32")
    ap.add_argument("--batches", default="64,256")
    ap.add_argument("--probes", default="4,8,16,32")
    ap.add_argument("--groups", default="0",
                    help="comma list of group_b values (0 = one union per "
                         "batch); grouped routing route-sorts the batch "
                         "and gives each block its own tile union — the "
                         "uniform-batch fix (round 4)")
    ap.add_argument("--block_s", type=int, default=0,
                    help="bank tile rows; smaller tiles = finer routing "
                         "(less DMA waste per probe) at more tiles. 0 = "
                         "per-mode default (1024 synthetic timing bank, "
                         "128 --real digits, 256 --real synthetic_cub)")
    ap.add_argument("--active_classes", type=int, default=8,
                    help="classes per concentrated batch")
    ap.add_argument("--cycles", type=int, default=5)
    args = ap.parse_args()
    if args.real:
        real_curve(args)
        return

    S, C, D = args.s, args.c, args.d
    rng = np.random.default_rng(0)
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(7), 3)
    sy = jax.random.randint(k0, (S,), 0, C, dtype=jnp.int32)
    cents = 0.5 * jax.random.normal(k1, (C, D), jnp.float32)

    @jax.jit
    def build(sy):
        return cents[sy] + 0.1 * jax.random.normal(k2, (S, D), jnp.float32)

    sfeat = build(sy)
    jax.block_until_ready(sfeat)
    cents_np = np.asarray(cents)
    print(f"bank on device: S={S} C={C} D={D}", flush=True)

    groups = [int(g) for g in args.groups.split(",")]
    for prec in args.precisions.split(","):
        t0 = time.perf_counter()
        ivf = prepare_support_ivf(
            sfeat, sy, C, kernel=args.kernel, precision=prec,
            block_s=args.block_s or 1024,
        )
        jax.block_until_ready(jax.tree.leaves(ivf))
        n_tiles = ivf.prep.lane.shape[0]
        print(f"[{prec}] ivf build {time.perf_counter() - t0:.1f} s, "
              f"n_tiles={n_tiles}", flush=True)

        for B in (int(b) for b in args.batches.split(",")):
            qs = {}
            qy_u = rng.integers(0, C, B)
            qs["uniform"] = qy_u
            qy_c = rng.choice(
                rng.choice(C, args.active_classes, replace=False), B
            )
            qs["concentrated"] = qy_c
            for tag, qy in qs.items():
                q = jnp.asarray(
                    cents_np[qy] + 0.1 * rng.standard_normal((B, D)),
                    jnp.float32,
                )
                exact = np.asarray(nw_fused_from_prepared(
                    q, ivf.prep, C, kernel=args.kernel))

                def exact_fn(q_, p_, carry):
                    return nw_fused_from_prepared(
                        q_, p_, C, kernel=args.kernel).sum() * 1e-6

                cases = [("exact", exact_fn, (q, ivf.prep))]
                stats = {}
                for p in (int(x) for x in args.probes.split(",")):
                    for g in groups:
                        gb = g or None
                        key = f"p{p}" + (f"g{g}" if g else "")
                        out = np.asarray(nw_fused_ivf_log_probs(
                            q, ivf, C, kernel=args.kernel, n_probe=p,
                            group_b=gb))
                        agree = (out.argmax(1) == exact.argmax(1)).mean()
                        pd = np.abs(np.exp(out) - np.exp(exact)).max()
                        # Union size: rerun routing on host for the report
                        # (whole-batch union for g=0; SUMMED per-group
                        # unions otherwise — the actual DMA cost).
                        from nwhead_tpu.ops.ivf import _route_affinity
                        from nwhead_tpu.ops.pallas_nw import _resolve_mode
                        mode, _, qn, _ = _resolve_mode(
                            args.kernel, {"logit_scale": jnp.float32(0.0)},
                            q, q[:1])
                        aff = _route_affinity(qn, ivf, mode)
                        ids = np.asarray(
                            jax.lax.top_k(aff, min(p, n_tiles))[1])
                        if gb:
                            order = np.argsort(ids[:, 0])
                            union = sum(
                                len(np.unique(ids[order[i:i + gb]]))
                                for i in range(0, B, gb)
                            )
                        else:
                            union = len(np.unique(ids))
                        stats[key] = (agree, pd, union)

                        def mk(pp, gb_):
                            def fn(q_, ivf_, carry):
                                return nw_fused_ivf_log_probs(
                                    q_, ivf_, C, kernel=args.kernel,
                                    n_probe=pp, group_b=gb_).sum() * 1e-6
                            return fn

                        cases.append((key, mk(p, gb), (q, ivf)))
                res = interleaved_time(cases, cycles=args.cycles)
                base = res["exact"]
                line = f"{prec} B={B} {tag}: exact {base * 1e3:.2f} ms"
                for key, (agree, pd, union) in stats.items():
                    line += (
                        f" | {key} {res[key] * 1e3:.2f} ms "
                        f"({base / res[key]:.2f}x, union {union}/"
                        f"{n_tiles}, agree {agree:.3f}, pd {pd:.1e})"
                    )
                print(line, flush=True)
        del ivf


if __name__ == "__main__":
    main()
