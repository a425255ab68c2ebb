"""NW-head evaluation CLI.

The reference's legacy README describes an ``eval.py`` (feature-bank
precompute + multi-mode evaluation + explainability dumps,
``legacy/README.md:110-124``) but the file is absent from the snapshot.
This is that tool: load a checkpoint, precompute (or load a cached) support
bank, evaluate any subset of the six inference modes, and optionally dump
support-influence rankings for a batch of queries.

Example:
    python eval.py --dataset bird --data_dir <cub_root> --arch resnet18 \
        --ckpt runs/.../checkpoints/model.best --modes random full cluster \
        --influence_queries 8
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

import jax
import jax.numpy as jnp


def main(argv=None):
    p = argparse.ArgumentParser(description="NW Head Evaluation (TPU)")
    p.add_argument("--dataset", type=str, required=True)
    p.add_argument("--data_dir", type=str, default="./")
    p.add_argument("--arch", type=str, default="resnet18")
    p.add_argument("--ckpt", type=str, default=None, help="checkpoint path (optional)")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--modes", nargs="+", default=["random", "full", "cluster"],
                   choices=["random", "full", "cluster", "ensemble", "knn",
                            "hnsw", "ivf"])
    p.add_argument("--kernel_type", type=str, default="euclidean")
    p.add_argument("--proj_dim", type=int, default=0)
    p.add_argument("--n_shot_full", type=int, default=100)
    p.add_argument("--n_shot_random", type=int, default=1)
    p.add_argument("--n_shot_cluster", type=int, default=1)
    p.add_argument("--n_neighbors", type=int, default=10)
    p.add_argument("--ivf_group_b", type=int, default=None,
                   help="mode=ivf: grouped routing block size (route-sort "
                        "the batch, one tile union per block; None = one "
                        "union per batch)")
    p.add_argument("--ivf_n_probe", type=lambda v: v if v == "auto" else int(v), default=32,
                   help="mode=ivf: routed bank tiles streamed per batch "
                        "(recall knob; >= the tile count is exact full mode)")
    p.add_argument("--num_val_steps", type=int, default=10**9)
    p.add_argument("--bank_cache", type=str, default=None,
                   help="directory to save/load the precomputed feature bank")
    p.add_argument("--influence_queries", type=int, default=0,
                   help="dump support-influence rankings for the first N queries")
    p.add_argument("--fit_temperature", action="store_true",
                   help="fit post-hoc temperature scaling per mode (T on the "
                        "first half of the val predictions, held-out "
                        "nll/ece reported raw vs calibrated)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--head_precision", type=str, default="f32",
                   choices=["f32", "bf16", "int8", "int4"],
                   help="serving-bank precision for the fused full-mode path")
    p.add_argument("--featurizer_precision", type=str, default="f32",
                   choices=["f32", "int8", "bf16_fused"],
                   help="int8: post-training-quantized serving featurizer "
                        "(BN-folded, per-channel int8 weights); bf16_fused: "
                        "the bf16 fused-serving ViT graph (one kernel per "
                        "half-block, no calibration; ViT archs only)")
    p.add_argument("--calib_images", type=int, default=256,
                   help="calibration-set size for --featurizer_precision int8")
    p.add_argument("--fused_inference", action="store_true",
                   help="ViT archs: use the inference-only fused attention "
                        "and MLP Pallas kernels (1.55x on vit_s14)")
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--decoder", type=str, default="native",
                   choices=["native", "native_fused", "pil"])
    p.add_argument("--pretrained_path", type=str, default=None,
                   help="local torch checkpoint imported into the backbone")
    p.add_argument("--mesh", type=str, default=None,
                   help="'N_DATA,N_SUPPORT[,N_MODEL]' mesh for sharded full-mode eval")
    p.add_argument("--platform", default="default",
                   choices=["default", "cpu"],
                   help="force the JAX backend; 'cpu' keeps the CLI "
                        "usable when the TPU tunnel is down (the axon "
                        "jaxlib ignores JAX_PLATFORMS; a hung tunnel "
                        "blocks backend init)")
    args = p.parse_args(argv)
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import train as train_cli
    from nwhead_tpu.nw.net import NWNet
    from nwhead_tpu.models import load_model
    from nwhead_tpu.ops import metrics as M
    from nwhead_tpu.train import load_checkpoint

    ds_args = argparse.Namespace(dataset=args.dataset, data_dir=args.data_dir,
                                 seed=args.seed, workers=args.workers,
                                 decoder=args.decoder)
    train_ds, val_ds = train_cli.build_datasets(ds_args)
    mesh = train_cli.build_mesh(args)

    dtype = jnp.bfloat16 if args.bf16 else None
    is_cifar = args.dataset in ("cifar10", "cifar100")
    name = {"resnet18": "CIFAR_ResNet18" if is_cifar else "resnet18",
            "densenet121": "CIFAR_DenseNet121" if is_cifar else "densenet121"}.get(args.arch, args.arch)
    extra = {}
    if args.fused_inference:
        if not name.startswith("vit"):
            raise SystemExit("--fused_inference applies to ViT archs only")
        extra = {"attn_impl": "fused", "mlp_impl": "fused"}
    featurizer = load_model(name, pretrained=args.pretrained_path or False,
                            dtype=dtype, **extra)

    net = NWNet(
        featurizer,
        train_ds.num_classes,
        support_dataset=train_ds,
        feat_dim=featurizer.feat_dim,
        proj_dim=args.proj_dim,
        kernel_type=args.kernel_type,
        n_shot_full=args.n_shot_full,
        n_shot_random=args.n_shot_random,
        n_shot_cluster=args.n_shot_cluster,
        n_neighbors=args.n_neighbors,
        head_precision=args.head_precision,
        ivf_n_probe=args.ivf_n_probe,
        ivf_group_b=args.ivf_group_b,
        seed=args.seed,
        mesh=mesh,
    )
    sample = jnp.asarray(train_ds.gather(np.arange(min(args.batch_size, len(train_ds)))))
    variables = net.init(jax.random.PRNGKey(args.seed), sample)
    if args.ckpt:
        # BN-free backbones (ViT) init with only a 'params' collection.
        restored = load_checkpoint(args.ckpt, target={
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {})})
        variables = {"params": restored["params"]}
        if restored.get("batch_stats"):
            variables["batch_stats"] = restored["batch_stats"]
        print(f"Loaded checkpoint {args.ckpt}")

    if args.featurizer_precision == "int8":
        if args.bank_cache:
            raise SystemExit(
                "--bank_cache cannot be combined with --featurizer_precision "
                "int8: cached float bank features would mix with quantized "
                "query features (and vice versa); precompute fresh"
            )
        n_cal = min(args.calib_images, len(train_ds))
        calib = train_ds.gather(np.arange(n_cal))
        net.quantize_featurizer(variables, calib)
        print(f"Quantized featurizer (int8 PTQ, {n_cal} calibration images)")
    elif args.featurizer_precision == "bf16_fused":
        if args.bank_cache:
            raise SystemExit(
                "--bank_cache cannot be combined with --featurizer_precision "
                "bf16_fused: cached float bank features would mix with "
                "fused-graph query features; precompute fresh"
            )
        net.fuse_featurizer(variables)
        print("Fused featurizer (bf16 serving graph, LN/residual folded)")

    # Precompute (or restore) the support bank.
    from nwhead_tpu.data import FeatureBankCache

    cache = FeatureBankCache(args.bank_cache) if args.bank_cache else None
    if cache is not None and cache.exists():
        emb, lbl, meta = cache.load()
        # restore_bank (vs a bare build_infer_iters) also builds the
        # prepared/sharded serving banks, so the fused full-mode path is
        # as fast from a cache restore as from a fresh precompute.
        net.restore_bank(variables, emb, lbl, meta)
        print(f"Loaded cached bank from {args.bank_cache} ({len(lbl)} items)")
    else:
        net.precompute(variables)
        if cache is not None:
            cache.save(np.asarray(net.full_feat), np.asarray(net.full_y))
            print(f"Saved bank to {args.bank_cache}")

    from nwhead_tpu.data.pipeline import prefetch_to_device
    from nwhead_tpu.train.trainer import _padded_eval_batches

    results = {}
    bs = args.batch_size
    for mode in args.modes:
        lps_all, gts = [], []
        correct = total = 0
        loss_sum = 0.0
        batches = _padded_eval_batches(val_ds, bs, args.num_val_steps)
        for img, label in prefetch_to_device(batches, size=2):
            real = label.shape[0]
            out = net.predict(variables, jnp.asarray(img), mode)
            if isinstance(out, tuple):
                out = out[0]
            out = out[:real]
            label_np = np.asarray(label)
            loss_sum += float(M.nll_loss(out, label)) * real
            correct += int((np.asarray(out).argmax(-1) == label_np).sum())
            total += real
            lps_all.append(np.asarray(out, np.float32))
            gts.append(label_np)
        lps, ys = np.concatenate(lps_all), np.concatenate(gts)
        ece = float(M.ece(np.exp(lps), ys)) * 100
        results[mode] = {
            "acc": 100.0 * correct / total,
            "nll": loss_sum / total,
            "ece": ece,
            "n": total,
        }
        print(f"[{mode}] acc={results[mode]['acc']:.3f}% nll={results[mode]['nll']:.4f} ece={ece:.3f}")

        if args.fit_temperature and total >= 4:
            # Post-hoc temperature scaling (the calibration step the
            # reference's gpleiss-derived ECE metric implies): fit T on a
            # random half of the val predictions, report the held-out half
            # raw vs calibrated — an honest split, not train-on-test. The
            # split is a seeded PERMUTATION: class-sorted val sets (CUB
            # directory order) would otherwise put disjoint classes in the
            # two halves and conflate calibration with class shift.
            from nwhead_tpu.ops.calibrate import (apply_temperature,
                                                  fit_temperature)

            perm = np.random.default_rng(args.seed).permutation(len(ys))
            lps, ys = lps[perm], ys[perm]
            h = len(ys) // 2
            T = float(fit_temperature(lps[:h], ys[:h]))
            hold, yh = jnp.asarray(lps[h:]), ys[h:]
            cal = apply_temperature(hold, T)
            results[mode].update({
                "temperature": T,
                "nll_holdout_raw": float(M.nll_loss(hold, yh)),
                "nll_holdout_cal": float(M.nll_loss(cal, yh)),
                "ece_holdout_raw": float(M.ece(np.exp(np.asarray(hold)), yh)) * 100,
                "ece_holdout_cal": float(M.ece(np.exp(np.asarray(cal)), yh)) * 100,
            })
            r = results[mode]
            print(f"[{mode}] T={T:.3f}  holdout nll "
                  f"{r['nll_holdout_raw']:.4f}->{r['nll_holdout_cal']:.4f}  "
                  f"ece {r['ece_holdout_raw']:.3f}->{r['ece_holdout_cal']:.3f}")

    if args.influence_queries > 0:
        nq = args.influence_queries
        img = jnp.asarray(val_ds.gather(np.arange(nq)))
        infl = net.support_influence(variables, img, val_ds.targets[:nq], mode="full")
        order = np.argsort(-infl, axis=-1)
        print("Top-5 most helpful support items per query (index: influence):")
        for i in range(nq):
            tops = ", ".join(f"{j}:{infl[i, j]:+.4f}" for j in order[i, :5])
            print(f"  query {i} (y={val_ds.targets[i]}): {tops}")

    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
