"""Multi-chip scaling benchmark: fires the day real multi-chip hardware
exists (the way scripts/parity_run.py does for real data).

Measures, on an N-device mesh:
  1. support-sharded full-mode NW predict throughput (the 'support' mesh
     axis — SURVEY.md §2.5's SP/CP analog) vs the same bank on ONE device,
  2. data-parallel NW training-step time at fixed per-device batch (weak
     scaling) vs one device,
and reports scaling efficiencies as one JSON line.

On this environment (one real TPU chip behind the axon tunnel) it runs as
a smoke test on the virtual CPU mesh: correctness + the full measurement
code path, not meaningful absolute numbers. Pass ``--devices N`` on a real
pod and the same command produces the scaling table.

Usage:
    python scripts/multichip_bench.py --cpu 8            # virtual-mesh smoke
    python scripts/multichip_bench.py --devices 8        # real pod
    python scripts/multichip_bench.py --cpu 8 --tiny     # fixture-test shapes

Reference: the reference is strictly single-GPU (/root/reference/
train.py:128-133); there is no upstream counterpart to compare against —
the baseline here is our own single-device path.
"""

import argparse
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))


def _parse_args(argv=None):
    p = argparse.ArgumentParser(description="NW multi-chip scaling bench")
    p.add_argument("--devices", type=int, default=0,
                   help="mesh size (0 = all available devices)")
    p.add_argument("--cpu", type=int, default=0, metavar="N",
                   help="force an N-device virtual CPU mesh (smoke mode)")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--support", type=int, default=8192,
                   help="global support-bank rows")
    p.add_argument("--dim", type=int, default=512)
    p.add_argument("--classes", type=int, default=200)
    p.add_argument("--precision", default="f32",
                   choices=["f32", "bf16", "int8"])
    p.add_argument("--train_batch_per_device", type=int, default=8)
    p.add_argument("--img", type=int, default=32,
                   help="train-step image size (resnet10 backbone)")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--skip_train", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="fixture-test shapes (seconds, not minutes)")
    return p.parse_args(argv)


def _time_calls(fn, args, iters):
    """Throughput timing: dispatch ``iters`` calls, force completion once.

    Under the axon tunnel ``block_until_ready`` does NOT wait — the final
    scalar readback is the only reliable completion barrier, and amortizing
    it over the loop measures throughput (the quantity a pod serves)."""
    import jax.numpy as jnp

    out = fn(*args)
    acc = jnp.sum(out[..., :1]) * 1e-20 if hasattr(out, "ndim") else out
    float(acc)  # warm/compile + completion
    t0 = time.perf_counter()
    outs = []
    for _ in range(iters):
        outs.append(fn(*args))
    # ONE barrier on the LAST output only — reading every output would
    # serialize `iters` tunnel readbacks and destroy the throughput
    # measurement (outs keeps the earlier results alive so the runtime
    # cannot elide their computation).
    float(jnp.sum(outs[-1][..., :1]) * 1e-20)
    dt = time.perf_counter() - t0
    return dt / iters


def main(argv=None):
    args = _parse_args(argv)
    if args.tiny:
        args.batch, args.support, args.dim = 8, 256, 128
        args.classes, args.iters = 8, 3
        args.train_batch_per_device, args.img = 2, 32

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu}"
        ).strip()

    import jax

    if args.cpu:
        # The axon jaxlib ignores the JAX_PLATFORMS env var; the config
        # path is the supported way to select the CPU backend.
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp

    from nwhead_tpu.parallel import ShardedSupportBank, make_mesh

    n = args.devices or (args.cpu or jax.device_count())
    devices = jax.devices()[:n]
    assert len(devices) == n, f"need {n} devices, have {len(devices)}"

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((args.support, args.dim)).astype(np.float32)
    labels = rng.integers(0, args.classes, args.support).astype(np.int32)
    q = jnp.asarray(
        rng.standard_normal((args.batch, args.dim)).astype(np.float32)
    )

    report = {
        "devices": n,
        "backend": jax.default_backend(),
        "batch": args.batch,
        "support": args.support,
        "dim": args.dim,
        "classes": args.classes,
        "precision": args.precision,
    }

    # -- 1. support-sharded full-mode predict ------------------------------
    def predict_qps(n_support_shards, device_subset):
        mesh = make_mesh(1, n_support_shards, devices=device_subset)
        bank = ShardedSupportBank.build(
            feats, labels, mesh, args.classes, precision=args.precision
        )
        fn = bank.predict_fn()
        t = _time_calls(fn, (q,), args.iters)
        return args.batch / t, t

    qps_1, t_1 = predict_qps(1, devices[:1])
    report["predict_qps_1dev"] = round(qps_1, 1)
    report["predict_ms_1dev"] = round(t_1 * 1e3, 3)
    if n > 1:
        qps_n, t_n = predict_qps(n, devices)
        report["predict_qps_ndev"] = round(qps_n, 1)
        report["predict_ms_ndev"] = round(t_n * 1e3, 3)
        # Support sharding splits a FIXED bank: ideal speedup = n.
        report["predict_scaling_efficiency"] = round(qps_n / (qps_1 * n), 3)

    # -- 1a. routed (IVF-pruned) sharded predict: per-shard tile-centroid
    # routing + pruned tile streaming (build(ivf=True)). Measured at a
    # small probe count — the serving-skew win — plus a full-probe
    # correctness gate vs the un-routed path.
    try:
        mesh_r = make_mesh(1, n, devices=devices)
        bank_r = ShardedSupportBank.build(
            feats, labels, mesh_r, args.classes, precision=args.precision,
            use_prepared=True, ivf=True,
        )
        n_tiles_local = bank_r.prepared.lane.shape[0] // n
        full_fn = bank_r.predict_fn(ivf_n_probe=n_tiles_local)
        plain_fn = bank_r.predict_fn()
        gate = float(np.abs(
            np.exp(np.asarray(full_fn(q))) - np.exp(np.asarray(plain_fn(q)))
        ).max())
        report["ivf_full_probe_gate"] = gate
        assert gate < 1e-5, gate
        probe = max(1, min(4, n_tiles_local))
        routed_fn = bank_r.predict_fn(ivf_n_probe=probe)
        t_r = _time_calls(routed_fn, (q,), args.iters)
        report["ivf_routed_qps_ndev"] = round(args.batch / t_r, 1)
        report["ivf_routed_ms_ndev"] = round(t_r * 1e3, 3)
        report["ivf_n_probe"] = probe
    except Exception as e:  # pragma: no cover - diagnostic path
        report["ivf_error"] = f"{type(e).__name__}: {e}"

    # -- 1b. sharded ensemble + exact-KNN predict (the other two bank-
    # holding modes; both ride the same partials merge — measured so the
    # pod table covers every sharded inference path) -----------------------
    from jax.sharding import NamedSharding, PartitionSpec as P
    from nwhead_tpu.parallel import (
        sharded_ensemble_predict_fn, sharded_knn_predict_fn,
    )

    if n > 1:
        mesh = make_mesh(1, n, devices=devices)
        shard_s = NamedSharding(mesh, P("support"))
        shard_es = NamedSharding(mesh, P(None, "support"))
        n_envs = 3
        s_env = (args.support // n_envs // n) * n  # per-env, shard-divisible
        if s_env > 0:
            ens_feat = jax.device_put(jnp.asarray(
                feats[: n_envs * s_env].reshape(n_envs, s_env, args.dim)
            ), shard_es)
            ens_y = jax.device_put(jnp.asarray(
                labels[: n_envs * s_env].reshape(n_envs, s_env)
            ), shard_es)
            ens_mask = jax.device_put(
                jnp.ones((n_envs, s_env), jnp.float32), shard_es
            )
            ens_fn = sharded_ensemble_predict_fn(
                mesh, ens_feat, ens_y, ens_mask, args.classes
            )
            t_e = _time_calls(ens_fn, (q,), args.iters)
            report["ensemble_qps_ndev"] = round(args.batch / t_e, 1)
            report["ensemble_ms_ndev"] = round(t_e * 1e3, 3)

        # Pad the bank to a shard multiple (mask 0 = absent), like
        # ShardedSupportBank.build — a non-dividing device count must not
        # kill the scaling table.
        s_pad = -(-args.support // n) * n
        feats_p = np.zeros((s_pad, args.dim), np.float32)
        feats_p[: args.support] = feats
        labels_p = np.zeros(s_pad, np.int32)
        labels_p[: args.support] = labels
        mask_p = np.zeros(s_pad, np.float32)
        mask_p[: args.support] = 1.0
        k = min(20, s_pad // n)
        knn_fn = sharded_knn_predict_fn(
            mesh,
            jax.device_put(jnp.asarray(feats_p), shard_s),
            jax.device_put(jnp.asarray(labels_p), shard_s),
            jax.device_put(jnp.asarray(mask_p), shard_s),
            args.classes, k,
        )
        t_k = _time_calls(knn_fn, (q,), args.iters)
        report["knn_qps_ndev"] = round(args.batch / t_k, 1)
        report["knn_ms_ndev"] = round(t_k * 1e3, 3)

    # -- 2. data-parallel training step (weak scaling) ---------------------
    if not args.skip_train:
        report.update(_train_scaling(args, devices))

    print(json.dumps(report))
    return report


def _train_scaling(args, devices):
    import numpy as np
    import optax

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nwhead_tpu.models import load_model
    from nwhead_tpu.nw.net import NWModel
    from nwhead_tpu.parallel import make_mesh

    rng = np.random.default_rng(0)
    C = min(args.classes, 8)
    S_ep = 2 * C
    model = NWModel(
        featurizer=load_model("resnet10"), n_classes=C, feat_dim=512
    )
    simg = jnp.asarray(
        rng.standard_normal((S_ep, args.img, args.img, 3)).astype(np.float32)
    )
    sy = jnp.asarray(rng.integers(0, C, S_ep).astype(np.int32))
    tx = optax.sgd(1e-2, momentum=0.9, nesterov=True)

    def step_time(n_data, device_subset):
        mesh = make_mesh(n_data, 1, devices=device_subset)
        B = args.train_batch_per_device * n_data
        qimg = jnp.asarray(
            rng.standard_normal((B, args.img, args.img, 3)).astype(np.float32)
        )
        qy = jnp.asarray(rng.integers(0, C, B).astype(np.int32))
        variables = model.init(
            jax.random.PRNGKey(0), qimg[:1], simg, sy, train=False
        )
        opt_state = tx.init(variables["params"])
        data = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        qimg = jax.device_put(qimg, data)
        qy = jax.device_put(qy, data)
        params = jax.device_put(variables["params"], repl)
        stats = jax.device_put(variables.get("batch_stats", {}), repl)
        opt_state = jax.device_put(opt_state, repl)

        @jax.jit
        def train_step(params, batch_stats, opt_state, qimg, qy):
            def loss_fn(p):
                out, upd = model.apply(
                    {"params": p, "batch_stats": batch_stats}, qimg, simg,
                    sy, train=True, mutable=["batch_stats"],
                )
                logp = out[0] if isinstance(out, tuple) else out
                nll = -jnp.mean(
                    jnp.take_along_axis(logp, qy[:, None], axis=1)
                )
                return nll, upd["batch_stats"]

            (nll, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            return (
                optax.apply_updates(params, updates), new_stats, new_opt, nll
            )

        # warm/compile
        params, stats, opt_state, nll = train_step(
            params, stats, opt_state, qimg, qy
        )
        float(nll)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            params, stats, opt_state, nll = train_step(
                params, stats, opt_state, qimg, qy
            )
        float(nll)  # completion barrier for the chain
        return (time.perf_counter() - t0) / args.iters, B

    t1, B1 = step_time(1, devices[:1])
    out = {
        "train_ms_1dev": round(t1 * 1e3, 2),
        "train_img_per_sec_1dev": round(B1 / t1, 1),
    }
    n = len(devices)
    if n > 1:
        tn, Bn = step_time(n, devices)
        out["train_ms_ndev"] = round(tn * 1e3, 2)
        out["train_img_per_sec_ndev"] = round(Bn / tn, 1)
        # Weak scaling: ideal = same step time at n-fold global batch.
        out["train_scaling_efficiency"] = round(t1 / tn, 3)
    return out


if __name__ == "__main__":
    main()
