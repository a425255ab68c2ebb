"""Convert CIFAR-10/100 python-pickle batches to the npy layout train.py reads.

Usage:
    python scripts/prepare_cifar.py --src /path/to/cifar-10-batches-py --out data/cifar10
    python scripts/prepare_cifar.py --src /path/to/cifar-100-python --out data/cifar100 --cifar100

Produces {train,test}_{images,labels}.npy with images as (N, 32, 32, 3) uint8
(the NHWC layout the framework uses natively).
"""

import argparse
import os
import pickle

import numpy as np


def _load_batch(path, label_key):
    with open(path, "rb") as f:
        d = pickle.load(f, encoding="bytes")
    data = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    labels = np.asarray(d[label_key])
    return data, labels


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--cifar100", action="store_true")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    if args.cifar100:
        tr_x, tr_y = _load_batch(os.path.join(args.src, "train"), b"fine_labels")
        te_x, te_y = _load_batch(os.path.join(args.src, "test"), b"fine_labels")
    else:
        parts = [
            _load_batch(os.path.join(args.src, f"data_batch_{i}"), b"labels")
            for i in range(1, 6)
        ]
        tr_x = np.concatenate([p[0] for p in parts])
        tr_y = np.concatenate([p[1] for p in parts])
        te_x, te_y = _load_batch(os.path.join(args.src, "test_batch"), b"labels")

    np.save(os.path.join(args.out, "train_images.npy"), tr_x)
    np.save(os.path.join(args.out, "train_labels.npy"), tr_y)
    np.save(os.path.join(args.out, "test_images.npy"), te_x)
    np.save(os.path.join(args.out, "test_labels.npy"), te_y)
    print(f"Wrote {len(tr_y)} train / {len(te_y)} test images to {args.out}")


if __name__ == "__main__":
    main()
