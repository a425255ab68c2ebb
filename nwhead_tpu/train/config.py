"""CLI flag surface mirroring the reference parser (``train.py:22-113``):
I/O, ML, NW-head, and wandb flag groups, ``--x/--no_x`` boolean pairs,
``key=value`` kwargs parsing, hyperparameter-encoding run-dir naming, and
the ``args.txt`` JSON dump."""

from __future__ import annotations

import argparse
import json
import os
from pprint import pprint


def parse_bool(v: str) -> bool:
    if v.lower() == "true":
        return True
    if v.lower() == "false":
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


class ParseKwargs(argparse.Action):
    """key1=value1 key2=value2 -> dict with int/float/bool coercion
    (``util/utils.py:87-102``)."""

    def __call__(self, parser, namespace, values, option_string=None):
        out = {}
        for value in values:
            key, raw = value.split("=", 1)
            if raw.replace("-", "").isnumeric():
                out[key] = int(raw)
            elif raw.replace("-", "").replace(".", "").isnumeric():
                out[key] = float(raw)
            elif raw in ("True", "true"):
                out[key] = True
            elif raw in ("False", "false"):
                out[key] = False
            else:
                out[key] = raw
        setattr(namespace, self.dest, out)


class Parser(argparse.ArgumentParser):
    def __init__(self):
        super().__init__(description="NW Head Training (TPU)")
        # I/O
        self.add_argument("--models_dir", default="./", type=str)
        self.add_argument("--data_dir", default="./", type=str)
        self.add_argument("--log_interval", type=int, default=25)
        # Host image-decode threads (the reference's DataLoader worker count,
        # train.py:32-33; default 8 here — TPU steps are fast enough that
        # synchronous decode starves the device).
        self.add_argument("--workers", type=int, default=8)
        # JPEG decode path: 'native' (first-party C++ pool, PIL fallback),
        # 'native_fused' (decode+crop+resize in one native pass — fastest,
        # subpixel bilinear differences vs PIL), or 'pil'.
        self.add_argument("--decoder", type=str, default="native",
                          choices=["native", "native_fused", "pil"])
        self.add_bool_arg("debug_mode", False)

        # ML
        self.add_argument("--dataset", type=str, required=True)
        self.add_argument("--lr", type=float, default=1e-3)
        self.add_argument("--batch_size", type=int, default=1)
        self.add_argument("--num_steps_per_epoch", type=int, default=10000000)
        self.add_argument("--num_val_steps_per_epoch", type=int, default=10000000)
        self.add_argument("--num_epochs", type=int, default=200)
        self.add_argument("--scheduler_milestones", nargs="+", type=int, default=(100, 150))
        self.add_argument("--scheduler_gamma", type=float, default=0.1)
        self.add_argument("--seed", type=int, default=0)
        self.add_argument("--platform", default="default",
                          choices=["default", "cpu"],
                          help="force the JAX backend; 'cpu' keeps the CLI "
                               "usable when the TPU tunnel is down (the "
                               "axon jaxlib ignores JAX_PLATFORMS; a hung "
                               "tunnel blocks backend init)")
        self.add_argument("--weight_decay", type=float, default=1e-4)
        self.add_argument("--arch", type=str, default="resnet18")
        # Local pretrained checkpoint (.pth/.pt/.npz) imported into the
        # backbone at init — the reference's torchvision/hub pretrained path
        # (train.py:212-214) without network egress.
        self.add_argument("--pretrained_path", type=str, default=None)
        # Device mesh 'N_DATA,N_SUPPORT[,N_MODEL]' — enables data-parallel
        # training + support-sharded full-mode eval (nwhead only).
        self.add_argument("--mesh", type=str, default=None)
        self.add_argument("--train_method", default="nwhead")
        self.add_bool_arg("freeze_featurizer", False)
        self.add_bool_arg("resume", False)  # wired resume (reference lacks it)
        self.add_bool_arg("bf16", False)  # bf16 compute dtype for the backbone

        # NW head
        self.add_argument("--kernel_type", type=str, default="euclidean")
        self.add_argument("--proj_dim", type=int, default=0)
        self.add_argument("--n_shot", type=int, default=1)
        self.add_argument("--n_way", type=int, default=None)
        self.add_argument("--train_type", type=str, default="random", choices=["random", "irm"])
        # Serving-bank precision for fused full-mode predict (f32 exact;
        # bf16/int8/int4 cut bank traffic 2x/4x/8x — training math stays f32).
        self.add_argument("--head_precision", type=str, default="f32",
                          choices=["f32", "bf16", "int8", "int4"])

        # Weights & Biases
        self.add_bool_arg("use_wandb", False)
        self.add_argument("--wandb_api_key_path", type=str)
        self.add_argument("--wandb_kwargs", nargs="*", action=ParseKwargs, default={})

    def add_bool_arg(self, name: str, default: bool = True) -> None:
        group = self.add_mutually_exclusive_group(required=False)
        group.add_argument("--" + name, dest=name, action="store_true")
        group.add_argument("--no_" + name, dest=name, action="store_false")
        self.set_defaults(**{name: default})

    def parse(self, argv=None):
        args = self.parse_args(argv)
        args.run_dir = os.path.join(
            args.models_dir,
            "method{method}_dataset{dataset}_arch{arch}_lr{lr}_bs{bs}_projdim{proj}"
            "_nshot{nshot}_nway{nway}_wd{wd}_seed{seed}".format(
                method=args.train_method,
                dataset=args.dataset,
                arch=args.arch,
                lr=args.lr,
                bs=args.batch_size,
                proj=args.proj_dim,
                nshot=args.n_shot,
                nway=args.n_way,
                wd=args.weight_decay,
                seed=args.seed,
            ),
        )
        args.ckpt_dir = os.path.join(args.run_dir, "checkpoints")
        os.makedirs(args.run_dir, exist_ok=True)
        os.makedirs(args.ckpt_dir, exist_ok=True)

        print("Arguments:")
        pprint(vars(args))
        with open(os.path.join(args.run_dir, "args.txt"), "w") as f:
            json.dump(vars(args), f, indent=4)
        return args


def initialize_wandb(config) -> None:
    """Optional W&B init (``util/utils.py:70-76``); gated import — the
    environment may not ship wandb."""
    try:
        import wandb
    except ImportError as e:
        raise ImportError("wandb is not installed; run with --no_use_wandb") from e
    if config.wandb_api_key_path is not None:
        with open(config.wandb_api_key_path) as f:
            os.environ["WANDB_API_KEY"] = f.read().strip()
    wandb.init(**config.wandb_kwargs)
    wandb.config.update(config)
