"""NW-head training CLI (TPU-native).

Equivalent of the reference entry point (``/root/reference/train.py:116-335``):
dataset/transform wiring, backbone + NW/FC network construction, SGD +
milestone LR, eval-before-train epoch loop with per-mode NW evaluation,
best-checkpoint on full-mode accuracy, periodic checkpoints — plus a working
``--resume`` (the reference declares load_checkpoint but never wires it).

Example (the canonical CUB-200 recipe, README.md:140-152):
    python train.py --dataset bird --data_dir <cub_root> --arch resnet18 \
        --batch_size 8 --lr 1e-2 --num_epochs 1000 \
        --scheduler_milestones 500 750 --n_way 10 --train_method nwhead
"""

from __future__ import annotations

import os

import numpy as np

from nwhead_tpu.data import (
    ArrayDataset,
    Cub200Dataset,
    FGVCAircraftDataset,
    Flowers102Dataset,
    StanfordDogDataset,
    make_digits_dataset,
    make_synthetic_dataset,
)
from nwhead_tpu.data import transforms as T
from nwhead_tpu.models import feature_dim, load_model
from nwhead_tpu.nw.fc import FCNet
from nwhead_tpu.nw.net import NWNet
from nwhead_tpu.train import (
    FCTrainer,
    NWTrainer,
    Parser,
    initialize_wandb,
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)


def build_datasets(args):
    """Dataset + transform wiring (``train.py:136-188`` semantics; flower and
    aircraft splits match the reference's torchvision wiring,
    ``train.py:177-186``: Flowers102 'train'/'test', FGVCAircraft
    'trainval'/'test')."""
    is_cifar = args.dataset in ("cifar10", "cifar100")
    if is_cifar:
        t_train = T.cifar_train_transform(seed=args.seed)
        t_test = T.cifar_eval_transform()
    else:
        t_train = T.imagenet_train_transform(seed=args.seed)
        t_test = T.imagenet_eval_transform()
    kw = dict(workers=getattr(args, "workers", 8),
              decoder=getattr(args, "decoder", "native"))

    if args.dataset == "bird":
        train_ds = Cub200Dataset(args.data_dir, True, t_train, **kw)
        val_ds = Cub200Dataset(args.data_dir, False, t_test, **kw)
    elif args.dataset == "dog":
        train_ds = StanfordDogDataset(args.data_dir, True, t_train, **kw)
        val_ds = StanfordDogDataset(args.data_dir, False, t_test, **kw)
    elif args.dataset == "flower":
        train_ds = Flowers102Dataset(args.data_dir, "train", t_train, **kw)
        val_ds = Flowers102Dataset(args.data_dir, "test", t_test, **kw)
    elif args.dataset == "aircraft":
        train_ds = FGVCAircraftDataset(args.data_dir, "trainval", t_train, **kw)
        val_ds = FGVCAircraftDataset(args.data_dir, "test", t_test, **kw)
    elif args.dataset in ("cifar10", "cifar100"):
        train_ds, val_ds = _load_cifar(args.data_dir, args.dataset, t_train, t_test)
    elif args.dataset == "digits":
        # Real data with no egress: sklearn's bundled handwritten digits
        # (1797 images, 10 classes) — the parity protocol's real-data
        # point in download-blocked environments.
        train_ds = make_digits_dataset(True)
        val_ds = make_digits_dataset(False)
    elif args.dataset == "synthetic":  # tiny built-in set for smoke runs
        train_ds = make_synthetic_dataset(n=64, n_classes=4, size=32, seed=args.seed)
        val_ds = make_synthetic_dataset(n=32, n_classes=4, size=32, seed=args.seed + 1)
    elif args.dataset == "synthetic_cub":
        # CUB-SHAPED synthetic set (S≈6k, C=200, 224px — the reference's
        # canonical recipe scale, README.md:140-152) for on-chip training
        # endurance runs where the real dataset is egress-blocked
        # (scripts/endurance_run.py). ~3.6 GB of host f32.
        train_ds = make_synthetic_dataset(
            n=5994, n_classes=200, size=224, seed=args.seed,
            class_patterns=0.25)
        val_ds = make_synthetic_dataset(
            n=1000, n_classes=200, size=224, seed=args.seed + 1,
            class_patterns=0.25)
    else:
        raise NotImplementedError(args.dataset)
    return train_ds, val_ds


def _load_cifar(data_dir, name, t_train, t_test):
    """CIFAR from pre-extracted numpy arrays {train,test}_{images,labels}.npy
    under data_dir/<name>/ (no torchvision download in this environment)."""
    base = os.path.join(data_dir, name)
    tr_x = np.load(os.path.join(base, "train_images.npy"))
    tr_y = np.load(os.path.join(base, "train_labels.npy"))
    te_x = np.load(os.path.join(base, "test_images.npy"))
    te_y = np.load(os.path.join(base, "test_labels.npy"))
    n_classes = 10 if name == "cifar10" else 100
    return (
        ArrayDataset(tr_x, tr_y, n_classes, transform=t_train),
        ArrayDataset(te_x, te_y, n_classes, transform=t_test),
    )


def build_network(args, train_dataset, mesh=None):
    """Backbone + network construction (``train.py:199-237`` semantics).
    ``--pretrained_path`` flows into the backbone and is merged at init
    (the reference's torchvision/dinov2 pretrained path,
    ``train.py:212-214``, ``model/resnet.py:259-267``)."""
    import jax.numpy as jnp

    is_cifar = args.dataset in ("cifar10", "cifar100")
    if args.arch == "resnet18":
        name = "CIFAR_ResNet18" if is_cifar else "resnet18"
    elif args.arch == "densenet121":
        name = "CIFAR_DenseNet121" if is_cifar else "densenet121"
    elif args.arch in ("resnet50", "resnet34", "resnet10", "dinov2_vits14", "vit_s14", "vit_s16"):
        name = args.arch
    else:
        raise NotImplementedError(args.arch)
    dtype = jnp.bfloat16 if args.bf16 else None
    pretrained = getattr(args, "pretrained_path", None) or False
    featurizer = load_model(name, pretrained=pretrained, dtype=dtype)
    feat_dim = featurizer.feat_dim

    if args.train_method == "fchead":
        return FCNet(featurizer=featurizer, num_classes=train_dataset.num_classes)
    if args.train_method == "nwhead":
        return NWNet(
            featurizer,
            train_dataset.num_classes,
            support_dataset=train_dataset,
            feat_dim=feat_dim,
            proj_dim=args.proj_dim,
            kernel_type=args.kernel_type,
            train_type=args.train_type,
            n_shot=args.n_shot,
            n_way=args.n_way,
            debug_mode=args.debug_mode,
            head_precision=getattr(args, "head_precision", "f32"),
            seed=args.seed,
            mesh=mesh,
        )
    raise NotImplementedError(args.train_method)


def build_mesh(args):
    """--mesh 'N_DATA,N_SUPPORT[,N_MODEL]' -> device mesh (None if unset)."""
    spec = getattr(args, "mesh", None)
    if not spec:
        return None
    import math

    import jax

    from nwhead_tpu.parallel import make_mesh

    dims = [int(x) for x in spec.split(",")]
    n = math.prod(dims)
    devices = jax.devices()
    if n > len(devices):
        raise ValueError(f"--mesh {spec} needs {n} devices, have {len(devices)}")
    return make_mesh(*dims, devices=devices[:n])


def main(argv=None):
    args = Parser().parse(argv)
    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.seed > 0:
        np.random.seed(args.seed)

    mesh = build_mesh(args)
    train_ds, val_ds = build_datasets(args)
    network = build_network(args, train_ds, mesh=mesh)

    common = dict(
        lr=args.lr,
        batch_size=args.batch_size,
        milestones=args.scheduler_milestones,
        gamma=args.scheduler_gamma,
        weight_decay=args.weight_decay,
        freeze_featurizer=args.freeze_featurizer,
        seed=args.seed,
    )
    if args.train_method == "nwhead":
        trainer = NWTrainer(network, train_ds, val_ds, mesh=mesh, **common)
    else:
        if mesh is not None:
            raise NotImplementedError("--mesh supports --train_method nwhead only")
        trainer = FCTrainer(network, train_ds, val_ds, **common)

    start_epoch = 1
    if args.resume:
        path = latest_checkpoint(args.ckpt_dir)
        if path:
            restored = load_checkpoint(
                path,
                target={
                    "params": trainer.state.params,
                    "batch_stats": trainer.state.batch_stats,
                    "opt_state": trainer.state.opt_state,
                },
            )
            trainer.state.params = restored["params"]
            trainer.state.batch_stats = restored["batch_stats"]
            trainer.state.opt_state = restored["opt_state"]
            start_epoch = int(restored["epoch"]) + 1
            trainer.state.step = (start_epoch - 1) * trainer.steps_per_epoch
            if args.train_method == "nwhead" and os.path.exists(
                path + ".sampler.json"
            ):
                import json as _json

                with open(path + ".sampler.json") as f:
                    st = _json.load(f)
                network.support_train.set_rng_state(st["support"])
                trainer.rng.bit_generator.state = st["trainer"]
                print("Restored sampler RNG state")
            print(f"Resumed from {path} at epoch {start_epoch}")

    if args.use_wandb:
        initialize_wandb(args)

    best_acc1 = 0.0
    for epoch in range(start_epoch, args.num_epochs + 1):
        print("Epoch:", epoch)
        print(f"lr={float(trainer.lr_schedule(trainer.state.step)):.6g}")
        if args.train_method == "nwhead":
            acc1 = trainer.eval_all_modes(num_steps=args.num_val_steps_per_epoch)
        else:
            acc1 = trainer.eval_epoch(num_steps=args.num_val_steps_per_epoch)

        print("Training...")
        trainer.train_epoch(num_steps=args.num_steps_per_epoch)

        is_best = acc1 > best_acc1
        best_acc1 = max(acc1, best_acc1)
        if epoch % args.log_interval == 0:
            path = save_checkpoint(
                epoch,
                {
                    "params": trainer.state.params,
                    "batch_stats": trainer.state.batch_stats,
                    "opt_state": trainer.state.opt_state,
                },
                args.ckpt_dir,
                is_best=is_best,
            )
            # Sampler-RNG sidecar: --resume then continues the exact
            # episode stream the uninterrupted run would have drawn
            # (bitwise on transform-free datasets; the reference has no
            # resume at all). JSON handles numpy PCG64's 128-bit ints.
            if args.train_method == "nwhead":
                import json as _json

                with open(path + ".sampler.json", "w") as f:
                    _json.dump({
                        "support": network.support_train.rng_state(),
                        # The trainer's own rng seeds each epoch's batcher.
                        "trainer": trainer.rng.bit_generator.state,
                    }, f)

        print(
            "Train loss={:.6f}, train acc={:.6f}".format(
                trainer.metrics["loss:train"].result(),
                trainer.metrics["acc:train"].result(),
            )
        )
        for k, m in sorted(trainer.val_metrics.items()):
            print(f"{k}={m.result():.6f}")

        if args.use_wandb:
            import wandb

            wandb.log({k: v.result() for k, v in trainer.metrics.items()})
            wandb.log({k: v.result() for k, v in trainer.val_metrics.items()})

        trainer.reset_metrics()


if __name__ == "__main__":
    main()
