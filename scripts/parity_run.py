"""BASELINE.md parity protocol, packaged as one command.

Runs the reference PyTorch implementation (imported from /root/reference)
and this TPU stack side-by-side on the SAME dataset with the SAME recipe
(SGD momentum-0.9 nesterov, MultiStepLR, NLL on log-probs, episodic n_way
sampling — README.md:140-152), then records per-mode top-1 / NLL / ECE for
both stacks and their deltas.

Both stacks consume the same numpy data loaders and transform code, so the
comparison isolates the model/training stacks (torch vs JAX/Pallas) from
preprocessing differences.

Usage (the moment CUB-200 is on disk):
    python scripts/parity_run.py --dataset bird --data_dir <cub_root> \
        --epochs 1000 --milestones 500 750 --lr 1e-2 --batch_size 8 \
        --n_way 10 --out parity_cub.json --update_baseline

Fixture-scale execution is tested end-to-end in
tests/test_parity_runner.py.

NOTE: keep n_way strictly below the dataset's class count — the REFERENCE
sampler divides by zero (NaN probabilities, ``nwhead/utils.py:126-129``)
when a query batch covers every class and n_way == n_classes. Real recipes
(n_way=10, C=200) never hit this.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _import_reference():
    """Import the reference nwhead package (hnswlib stubbed with exact knn)."""
    if "hnswlib" not in sys.modules:
        stub = types.ModuleType("hnswlib")

        class _Index:
            def __init__(self, space, dim):
                self.dim = dim

            def init_index(self, max_elements, ef_construction, M):
                pass

            def add_items(self, data):
                self.data = np.asarray(data)

            def knn_query(self, x, k):
                d = ((np.asarray(x)[:, None] - self.data[None]) ** 2).sum(-1)
                idx = np.argsort(d, -1)[:, :k]
                return idx, np.take_along_axis(d, idx, -1)

        stub.Index = _Index
        sys.modules["hnswlib"] = stub
    if REF not in sys.path:
        sys.path.append(REF)  # append: keep this repo's train.py first
    import importlib

    return (
        importlib.import_module("nwhead.nw"),
        importlib.import_module("model"),
    )


class _TorchDatasetAdapter:
    """Expose our numpy datasets (gather/targets) as a torch Dataset with the
    ``.targets``/``.num_classes`` attributes the reference requires
    (nw.py:71-72)."""

    def __init__(self, ds):
        import torch

        self._torch = torch
        self.ds = ds
        self.targets = np.asarray(ds.targets)
        self.num_classes = ds.num_classes

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, idx):
        scalar = np.isscalar(idx) or getattr(idx, "ndim", 1) == 0
        arr = self.ds.gather([int(idx)] if scalar else np.asarray(idx))
        t = self._torch.from_numpy(np.ascontiguousarray(arr.transpose(0, 3, 1, 2)))
        y = self.targets[idx]
        if scalar:
            return t[0], int(y)
        return t, self._torch.from_numpy(np.asarray(y))


def _metrics_from_logprobs(log_probs: np.ndarray, labels: np.ndarray) -> dict:
    from nwhead_tpu.ops import metrics as M

    probs = np.exp(log_probs)
    acc = float((log_probs.argmax(-1) == labels).mean()) * 100
    nll = float(-np.take_along_axis(log_probs, labels[:, None], -1).mean())
    ece = float(M.ece(probs, labels)) * 100
    return {"acc": acc, "nll": nll, "ece": ece}


def _seed_torch_stack(seed: int) -> None:
    """Make the reference leg reproducible. Its weight init draws from the
    global torch RNG and its episodic sampler from the global numpy legacy
    RNG (``nwhead/utils.py:129,136``) — seed both. (The jax leg seeds init
    through PRNGKey(seed); without this, --seed only reshuffled the torch
    leg's data order and reference numbers were irreproducible init noise.)"""
    import torch

    torch.manual_seed(seed)
    np.random.seed(seed)


def train_torch_recipe(network, t_train, args, step_loss) -> None:
    """The shared reference training loop (SGD momentum-0.9 nesterov +
    MultiStepLR gamma 0.1, ``train.py:242-250,337-350``), used by the NW,
    FC, and IRM reference legs so the recipe cannot drift between them.
    ``step_loss(network, criterion, img, label) -> loss tensor``."""
    import torch

    criterion = torch.nn.NLLLoss()
    optimizer = torch.optim.SGD(
        network.parameters(), lr=args.lr, momentum=0.9, weight_decay=1e-4,
        nesterov=True,
    )
    scheduler = torch.optim.lr_scheduler.MultiStepLR(
        optimizer, milestones=args.milestones, gamma=0.1
    )
    rng = np.random.default_rng(args.seed)
    steps = args.steps_per_epoch or max(1, len(t_train) // args.batch_size)
    for _ in range(args.epochs):
        network.train()
        order = rng.permutation(len(t_train))
        for s in range(steps):
            idx = order[(s * args.batch_size) % len(order):][: args.batch_size]
            if len(idx) < args.batch_size:
                idx = order[: args.batch_size]
            img, label = t_train[idx]
            optimizer.zero_grad()
            loss = step_loss(network, criterion, img, label)
            loss.backward()
            optimizer.step()
        scheduler.step()


def predict_torch(forward, t_val, args) -> np.ndarray:
    """Batched eval over the val set: ``forward(img) -> log-probs``."""
    outs = []
    for s in range(0, len(t_val), args.batch_size):
        idx = np.arange(s, min(s + args.batch_size, len(t_val)))
        img, _ = t_val[idx]
        outs.append(forward(img).numpy())
    return np.concatenate(outs)


def run_reference(train_ds, val_ds, args) -> dict:
    """The reference recipe on the torch stack (train.py:242-250,337-379)."""
    import torch

    ref_nw, ref_model = _import_reference()
    _seed_torch_stack(args.seed)

    t_train = _TorchDatasetAdapter(train_ds)
    t_val = _TorchDatasetAdapter(val_ds)

    featurizer = ref_model.load_model(args.ref_arch or args.arch)
    network = ref_nw.NWNet(
        featurizer,
        t_train.num_classes,
        support_dataset=t_train,
        feat_dim=args.feat_dim,
        proj_dim=args.proj_dim,
        kernel_type=args.kernel_type,
        n_shot=args.n_shot,
        n_way=args.n_way,
        device="cpu",
    )
    # log-probs forward (return_mask=False)
    train_torch_recipe(
        network, t_train, args,
        lambda net, criterion, img, label: criterion(net(img, label), label),
    )

    network.eval()
    with torch.no_grad():
        network.precompute()
        results = {}
        for mode in args.modes:
            results[mode] = _metrics_from_logprobs(
                predict_torch(
                    lambda img, m=mode: network.predict(img, m), t_val, args
                ),
                t_val.targets,
            )
    return results


def run_reference_fc(train_ds, val_ds, args) -> dict:
    """The FC-baseline recipe on the torch stack (``fchead/fc.py:5-17``,
    step semantics ``train.py:381-399``): same SGD/MultiStepLR recipe, NLL
    on log-softmax output."""
    import importlib

    import torch

    _import_reference()  # sets sys.path + hnswlib stub
    ref_fc = importlib.import_module("fchead.fc")
    ref_model = importlib.import_module("model")
    _seed_torch_stack(args.seed)

    t_train = _TorchDatasetAdapter(train_ds)
    t_val = _TorchDatasetAdapter(val_ds)
    featurizer = ref_model.load_model(args.ref_arch or args.arch)
    network = ref_fc.FCNet(featurizer, args.feat_dim, t_train.num_classes)
    train_torch_recipe(
        network, t_train, args,
        lambda net, criterion, img, label: criterion(net(img), label),
    )

    network.eval()
    with torch.no_grad():
        log_probs = predict_torch(network, t_val, args)
    return _metrics_from_logprobs(log_probs, t_val.targets)


def run_tpu_fc(train_ds, val_ds, args) -> dict:
    """The same FC-baseline recipe on this framework (``nw/fc.py`` +
    ``FCTrainer``)."""
    from nwhead_tpu.models import load_model
    from nwhead_tpu.nw.fc import FCNet
    from nwhead_tpu.train.trainer import FCTrainer

    model = FCNet(
        featurizer=load_model(args.arch), num_classes=train_ds.num_classes
    )
    trainer = FCTrainer(
        model, train_ds, val_ds,
        lr=args.lr, batch_size=args.batch_size,
        milestones=args.milestones, gamma=0.1, seed=args.seed,
    )
    for _ in range(args.epochs):
        trainer.train_epoch(num_steps=args.steps_per_epoch)
    trainer.eval_epoch()
    return {
        "acc": trainer.val_metrics["acc:val"].result(),
        "nll": trainer.val_metrics["loss:val"].result(),
        "ece": trainer.val_metrics["ece:val"].result(),
    }


def run_tpu_stack(train_ds, val_ds, args) -> dict:
    """The same recipe on this framework."""
    import time

    from nwhead_tpu.models import load_model
    from nwhead_tpu.nw.net import NWNet
    from nwhead_tpu.train.trainer import NWTrainer

    featurizer = load_model(args.arch)
    net = NWNet(
        featurizer,
        train_ds.num_classes,
        support_dataset=train_ds,
        feat_dim=args.feat_dim,
        proj_dim=args.proj_dim,
        kernel_type=args.kernel_type,
        n_shot=args.n_shot,
        n_way=args.n_way,
        seed=args.seed,
    )
    trainer = NWTrainer(
        net, train_ds, val_ds,
        lr=args.lr, batch_size=args.batch_size,
        milestones=args.milestones, gamma=0.1,
        eval_modes=tuple(args.modes), seed=args.seed,
    )
    t0 = time.perf_counter()
    for _ in range(args.epochs):
        trainer.train_epoch(num_steps=args.steps_per_epoch)
    t_train = time.perf_counter() - t0
    t0 = time.perf_counter()
    trainer.eval_all_modes()
    t_eval = time.perf_counter() - t0
    results = {"_timing": {
        "backend": __import__("jax").default_backend(),
        "train_s": round(t_train, 2),
        "eval_s": round(t_eval, 2),
    }}
    for mode in args.modes:
        results[mode] = {
            "acc": trainer.val_metrics[f"acc:val:{mode}"].result(),
            "nll": trainer.val_metrics[f"loss:val:{mode}"].result(),
            "ece": trainer.val_metrics[f"ece:val:{mode}"].result(),
        }

    bank_evals = [p for p, on in (
        ("bf16", getattr(args, "bf16_eval", False)),
        ("int4", getattr(args, "int4_eval", False)),
    ) if on]
    for bank_prec in bank_evals:
        # Reduced-precision serving-BANK accuracy on the TRAINED weights:
        # rebuild the prepared bank at bf16/int4 (featurizer stays float)
        # and re-evaluate full mode — the accuracy cost of the 2x/8x
        # bank-traffic options.
        from nwhead_tpu.nw.net import NWNet as _NWNet

        variables = trainer.state.variables()
        net_b = _NWNet(
            net.model.featurizer, net.n_classes, support_dataset=train_ds,
            feat_dim=args.feat_dim, proj_dim=args.proj_dim,
            kernel_type=args.kernel_type, head_precision=bank_prec,
            fused_min_support=1, seed=args.seed,
        )
        net_b.precompute(variables)
        outs, labels_all = [], np.asarray(val_ds.targets)
        for s in range(0, len(val_ds), args.batch_size):
            idx = np.arange(s, min(s + args.batch_size, len(val_ds)))
            out = net_b.predict(variables, val_ds.gather(idx), "full")
            outs.append(np.asarray(out[0] if isinstance(out, tuple) else out))
        results[f"full_{bank_prec}"] = _metrics_from_logprobs(
            np.concatenate(outs), labels_all
        )

    if getattr(args, "int8_eval", False):
        # int8-PTQ serving accuracy on the TRAINED weights: quantize the
        # featurizer, rebuild the bank, re-evaluate full mode — the accuracy
        # cost of the fast serving path, measured on this exact run.
        variables = trainer.state.variables()
        calib = train_ds.gather(
            np.arange(min(getattr(args, "calib_images", 256), len(train_ds)))
        )
        net.quantize_featurizer(variables, calib)
        net.precompute(variables)
        outs, labels_all = [], np.asarray(val_ds.targets)
        for s in range(0, len(val_ds), args.batch_size):
            idx = np.arange(s, min(s + args.batch_size, len(val_ds)))
            out = net.predict(variables, val_ds.gather(idx), "full")
            outs.append(np.asarray(out[0] if isinstance(out, tuple) else out))
        results["full_int8"] = _metrics_from_logprobs(
            np.concatenate(outs), labels_all
        )
    return results


def build_datasets(args):
    ns = argparse.Namespace(
        dataset=args.dataset, data_dir=args.data_dir, seed=args.seed,
        workers=args.workers,
    )
    import train as train_cli

    return train_cli.build_datasets(ns)


def main(argv=None):
    p = argparse.ArgumentParser(description="reference-vs-TPU parity run")
    p.add_argument("--dataset", required=True)
    p.add_argument("--data_dir", default="./")
    p.add_argument("--arch", default="resnet18")
    p.add_argument("--ref_arch", default=None,
                   help="reference zoo name if it differs (default: --arch)")
    p.add_argument("--feat_dim", type=int, default=512)
    p.add_argument("--proj_dim", type=int, default=0)
    p.add_argument("--kernel_type", default="euclidean")
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--steps_per_epoch", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--milestones", nargs="+", type=int, default=(500, 750))
    p.add_argument("--n_way", type=int, default=10)
    p.add_argument("--n_shot", type=int, default=1)
    p.add_argument("--modes", nargs="+", default=["random", "full", "cluster"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--stacks", default="both", choices=["both", "reference", "tpu"])
    p.add_argument("--int8_eval", action="store_true",
                   help="also evaluate full mode through the int8-PTQ serving "
                        "featurizer (tpu stack only; reported as 'full_int8')")
    p.add_argument("--bf16_eval", action="store_true",
                   help="also evaluate full mode through a bf16 prepared "
                        "serving bank (tpu stack only; 'full_bf16')")
    p.add_argument("--int4_eval", action="store_true",
                   help="also evaluate full mode through an int4 nibble-"
                        "packed prepared serving bank (tpu stack only; "
                        "'full_int4')")
    p.add_argument("--calib_images", type=int, default=256)
    p.add_argument("--fc_baseline", action="store_true",
                   help="also train/evaluate the FC-head baseline on each "
                        "selected stack with the same recipe (reported as "
                        "'fc') — reproduces the papers' NW-vs-FC "
                        "calibration comparison on this run's data")
    p.add_argument("--out", default=None, help="write results JSON here")
    p.add_argument("--update_baseline", action="store_true",
                   help="append the results table to BASELINE.md")
    p.add_argument("--platform", default="default",
                   choices=["default", "cpu"],
                   help="force the JAX backend; use 'cpu' when the TPU "
                        "tunnel is down or flaky (the axon jaxlib ignores "
                        "the JAX_PLATFORMS env var, and a hung tunnel "
                        "blocks backend init in a bare futex sleep)")
    args = p.parse_args(argv)
    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    train_ds, val_ds = build_datasets(args)
    report = {
        "protocol": vars(args).copy(),
        "date": datetime.date.today().isoformat(),
    }
    if args.stacks in ("both", "reference"):
        print("== reference (torch) stack ==", flush=True)
        report["reference"] = run_reference(train_ds, val_ds, args)
        if args.fc_baseline:
            print("== reference FC baseline ==", flush=True)
            report["reference"]["fc"] = run_reference_fc(train_ds, val_ds, args)
        print(json.dumps(report["reference"], indent=2), flush=True)
    if args.stacks in ("both", "tpu"):
        print("== nwhead_tpu stack ==", flush=True)
        report["tpu"] = run_tpu_stack(train_ds, val_ds, args)
        if args.fc_baseline:
            print("== nwhead_tpu FC baseline ==", flush=True)
            report["tpu"]["fc"] = run_tpu_fc(train_ds, val_ds, args)
        print(json.dumps(report["tpu"], indent=2), flush=True)
    if "reference" in report and "tpu" in report:
        compare = list(args.modes) + (["fc"] if args.fc_baseline else [])
        report["delta"] = {
            mode: {
                k: report["tpu"][mode][k] - report["reference"][mode][k]
                for k in ("acc", "nll", "ece")
            }
            for mode in compare
        }
        print("deltas (tpu - reference):", json.dumps(report["delta"], indent=2))

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {args.out}")

    if args.update_baseline and "delta" in report:
        lines = [
            "",
            f"## Parity run {report['date']} — {args.dataset}, {args.arch}, "
            f"{args.epochs} epochs",
            "",
            "| mode | ref acc | tpu acc | ref nll | tpu nll | ref ece | tpu ece |",
            "|---|---|---|---|---|---|---|",
        ]
        for mode in list(args.modes) + (["fc"] if args.fc_baseline else []):
            r, t = report["reference"][mode], report["tpu"][mode]
            lines.append(
                f"| {mode} | {r['acc']:.2f} | {t['acc']:.2f} | {r['nll']:.4f} "
                f"| {t['nll']:.4f} | {r['ece']:.3f} | {t['ece']:.3f} |"
            )
        with open(os.path.join(REPO, "BASELINE.md"), "a") as f:
            f.write("\n".join(lines) + "\n")
        print("appended results to BASELINE.md")
    return report


if __name__ == "__main__":
    main()
