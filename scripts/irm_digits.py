"""IRM training + ensemble inference on REAL data (digits with synthetic
environments).

Reference anchor: the NeurIPS-2023 invariant-representation extension
(arXiv:2309.13377) trains with single-environment episodes
(``/root/reference/nwhead/support.py:76-78`` — every step's support comes
from ONE randomly chosen environment) and evaluates with per-environment
prob-space ensemble averaging (``/root/reference/nwhead/nw.py:143-154``).
Both paths are unit/fixture-tested here; this script exercises them on
real images (sklearn's bundled digits — zero egress).

Protocol: each training image is assigned to one of three environments
carrying an environment-specific nuisance (identity / brightness-compress
/ gamma); the validation set carries an UNSEEN shift. Reported: full-mode
and ensemble-mode acc/NLL/ECE for ``train_type='irm'`` and, with
``--compare``, the same for plain ``train_type='random'`` (mixed-env
episodes) under the identical budget/seed.

CPU run (~4 min/stack): ``python scripts/irm_digits.py [--compare]``.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _env_shift(x: np.ndarray, env: int) -> np.ndarray:
    """Environment-specific nuisance transforms on [0,1] images."""
    if env == 0:
        return x
    if env == 1:
        return 0.8 * x + 0.2  # brightness-compressed
    if env == 2:
        return np.power(x, 1.5)  # gamma-darkened
    return 0.9 * x + 0.05  # the held-out validation shift


def build(args):
    from nwhead_tpu.data.datasets import ArrayDataset, make_digits_dataset

    tr = make_digits_dataset(train=True)
    va = make_digits_dataset(train=False)
    rng = np.random.default_rng(args.seed)
    env_array = rng.integers(0, 3, size=len(tr))
    imgs = np.stack([
        _env_shift(tr.images[i], int(env_array[i])) for i in range(len(tr))
    ])
    train_ds = ArrayDataset(imgs.astype(np.float32), tr.targets, 10)
    val_ds = ArrayDataset(
        _env_shift(va.images, 99).astype(np.float32), va.targets, 10
    )
    return train_ds, val_ds, env_array


def run(train_ds, val_ds, env_array, train_type, args):
    from nwhead_tpu.models import load_model
    from nwhead_tpu.nw.net import NWNet
    from nwhead_tpu.train.trainer import NWTrainer

    net = NWNet(
        load_model(args.arch), 10, support_dataset=train_ds,
        feat_dim=512, train_type=train_type,
        env_array=env_array if train_type == "irm" else None,
        n_shot=1, n_way=args.n_way, seed=args.seed,
    )
    trainer = NWTrainer(
        net, train_ds, val_ds, lr=args.lr, batch_size=args.batch_size,
        milestones=args.milestones, gamma=0.1,
        eval_modes=("full",) if train_type != "irm" else ("full", "ensemble"),
        seed=args.seed,
    )
    for _ in range(args.epochs):
        trainer.train_epoch(num_steps=args.steps_per_epoch)
    trainer.eval_all_modes()
    out = {}
    for mode in trainer.eval_modes:
        out[mode] = {
            "acc": round(trainer.val_metrics[f"acc:val:{mode}"].result(), 2),
            "nll": round(trainer.val_metrics[f"loss:val:{mode}"].result(), 4),
            "ece": round(trainer.val_metrics[f"ece:val:{mode}"].result(), 3),
        }
    return out


def run_reference(train_ds, val_ds, env_array, train_type, args):
    """The identical protocol on the reference torch stack — its IRM
    single-env episodes (``nwhead/support.py:76-78``) and prob-space env
    ensemble (``nw.py:143-154``) compared head-to-head with ours on the
    same real data, environments, and budget."""
    import torch

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    try:
        from parity_run import (_TorchDatasetAdapter, _import_reference,
                                _metrics_from_logprobs, _seed_torch_stack,
                                predict_torch, train_torch_recipe)
    finally:
        sys.path.pop(0)
    ref_nw, ref_model = _import_reference()
    _seed_torch_stack(args.seed)

    t_train = _TorchDatasetAdapter(train_ds)
    t_val = _TorchDatasetAdapter(val_ds)
    network = ref_nw.NWNet(
        ref_model.load_model(args.arch), 10, support_dataset=t_train,
        feat_dim=512, train_type=train_type,
        env_array=np.asarray(env_array) if train_type == "irm" else None,
        n_shot=1, n_way=args.n_way, device="cpu",
    )
    train_torch_recipe(
        network, t_train, args,
        lambda net, criterion, img, label: criterion(net(img, label), label),
    )

    network.eval()
    modes = ("full", "ensemble") if train_type == "irm" else ("full",)
    out = {}
    with torch.no_grad():
        network.precompute()
        for mode in modes:
            m = _metrics_from_logprobs(
                predict_torch(
                    lambda img, mm=mode: network.predict(img, mm), t_val, args
                ),
                t_val.targets,
            )
            out[mode] = {"acc": round(m["acc"], 2), "nll": round(m["nll"], 4),
                         "ece": round(m["ece"], 3)}
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="resnet10")
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--steps_per_epoch", type=int, default=40)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--milestones", nargs="+", type=int, default=(5, 7))
    p.add_argument("--n_way", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compare", action="store_true",
                   help="also run train_type='random' on the same budget")
    p.add_argument("--stacks", default="tpu",
                   choices=["tpu", "reference", "both"],
                   help="'reference' / 'both' also run the torch reference "
                        "stack's IRM + ensemble paths on the identical "
                        "data/environments/budget")
    p.add_argument("--platform", default="default",
                   choices=["default", "cpu"])
    args = p.parse_args(argv)
    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    train_ds, val_ds, env_array = build(args)
    report = {}
    if args.stacks in ("tpu", "both"):
        report["irm"] = run(train_ds, val_ds, env_array, "irm", args)
        print("irm:", json.dumps(report["irm"]), flush=True)
        if args.compare:
            report["random"] = run(train_ds, val_ds, env_array, "random", args)
            print("random:", json.dumps(report["random"]), flush=True)
    if args.stacks in ("reference", "both"):
        report["reference_irm"] = run_reference(
            train_ds, val_ds, env_array, "irm", args
        )
        print("reference_irm:", json.dumps(report["reference_irm"]), flush=True)
        if args.compare:
            report["reference_random"] = run_reference(
                train_ds, val_ds, env_array, "random", args
            )
            print("reference_random:",
                  json.dumps(report["reference_random"]), flush=True)
    return report


if __name__ == "__main__":
    main()
