"""Qualitative explanation panels: the reference's similarity-ranking and
influence-ranking figures (``/root/reference/figs/*.png``, produced offline
in notebooks) as one command against the live NW head.

For each query image the panel shows: the query (predicted class + prob),
its top-K support neighbors by softmax weight (``nw.py:245-249``
get_neighbors semantics), the most HELPFUL support item and — when one
exists — the most HARMFUL item by leave-one-out influence on the predicted
class (``util/metric.py:23-50``). Images are rescaled per-image for display
with ``linear_normalization`` — the reference's own debug-viz helper
(``nwhead/utils.py:161-176``).

Usage:
    python scripts/visualize.py --dataset synthetic --arch resnet10 \
        --out /tmp/panels.png --n_queries 4 --topk 5 [--platform cpu]
    # real runs: add --ckpt <run>/checkpoints/model.NNNN --dataset digits
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def build_args(ns):
    """The full serve.build_server namespace with visualize's overrides."""
    return argparse.Namespace(
        dataset=ns.dataset, data_dir=ns.data_dir, seed=ns.seed, workers=0,
        decoder="auto", bf16=False, fused_inference=False, arch=ns.arch,
        pretrained_path=None, proj_dim=0, kernel_type=ns.kernel_type,
        n_shot_full=ns.n_shot_full, head_precision="f32",
        batch_size=max(1, ns.n_queries), ckpt=ns.ckpt,
        featurizer_precision="f32", calib_images=64, bank_cache=None,
        mesh=None, serve_mode="full", ivf_probe=32, ivf_group=None,
    )


def main(argv=None):
    p = argparse.ArgumentParser(description="NW explanation panels")
    p.add_argument("--dataset", required=True)
    p.add_argument("--data_dir", default="./")
    p.add_argument("--arch", default="resnet18")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--kernel_type", default="euclidean")
    p.add_argument("--n_shot_full", type=int, default=100)
    p.add_argument("--n_queries", type=int, default=4)
    p.add_argument("--query_offset", type=int, default=0,
                   help="start index into the val split")
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--out", required=True, help="output PNG path")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default=None,
                   help="force a jax backend (e.g. cpu when the TPU "
                        "tunnel is down); env JAX_PLATFORMS is IGNORED "
                        "by this jaxlib")
    ns = p.parse_args(argv)

    import jax

    if ns.platform:
        jax.config.update("jax_platforms", ns.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import serve
    from nwhead_tpu.utils import linear_normalization

    net, variables, train_ds, val_ds = serve.build_server(build_args(ns))
    explain = serve._build_explainer(net, train_ds)

    qidx = np.arange(ns.query_offset,
                     min(ns.query_offset + ns.n_queries, len(val_ds)))
    imgs = np.asarray(val_ds.gather(qidx))
    qy = np.asarray(val_ds.targets)[qidx]
    log_probs, expl = explain(variables, imgs, ns.topk)

    bank_to_ds = np.concatenate(net.support_eval.full_bank_indices)

    def bank_img(row):
        return np.asarray(train_ds.gather(np.array([bank_to_ds[row]])))[0]

    def show(ax, img, title, color="black"):
        # linear_normalization is batch-level (B,H,W,C) like the reference.
        img = np.asarray(linear_normalization(np.asarray(img)[None]))[0]
        if img.ndim == 3 and img.shape[-1] == 1:
            img = img[..., 0]
        ax.imshow(img, cmap="gray" if img.ndim == 2 else None)
        ax.set_title(title, fontsize=7, color=color)
        ax.axis("off")

    n_rows = len(qidx)
    n_cols = 1 + ns.topk + 2  # query | neighbors | helpful | harmful
    fig, axes = plt.subplots(
        n_rows, n_cols, figsize=(1.6 * n_cols, 1.8 * n_rows), squeeze=False
    )
    for r, (e, lp) in enumerate(zip(expl, log_probs)):
        pred = e["predicted_class"]
        ok = pred == qy[r]
        show(axes[r][0], imgs[r],
             f"query  true={qy[r]}\npred={pred} "
             f"p={np.exp(lp[pred]):.2f}",
             color="green" if ok else "red")
        for c in range(ns.topk):
            ax = axes[r][1 + c]
            if c < len(e["neighbors"]):
                nb = e["neighbors"][c]
                show(ax, bank_img(nb["support_index"]),
                     f"nbr y={nb['label']}\nw={nb['weight']:.3f}")
            else:
                ax.axis("off")
        hcol = 1 + ns.topk
        if e["helpful"]:
            h = e["helpful"][0]
            show(axes[r][hcol], bank_img(h["support_index"]),
                 f"helpful y={h['label']}\ninfl={h['influence']:+.3f}",
                 color="green")
        else:
            axes[r][hcol].axis("off")
        if "most_harmful" in e:
            h = e["most_harmful"]
            show(axes[r][hcol + 1], bank_img(h["support_index"]),
                 f"harmful y={h['label']}\ninfl={h['influence']:+.3f}",
                 color="red")
        else:
            axes[r][hcol + 1].axis("off")

    fig.tight_layout()
    fig.savefig(ns.out, dpi=120)
    plt.close(fig)
    print(f"wrote {ns.out}: {n_rows} queries x (1+{ns.topk}+2) panels")
    return ns.out


if __name__ == "__main__":
    main()
