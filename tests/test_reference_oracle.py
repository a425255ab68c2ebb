"""End-to-end parity vs. the actual reference implementation.

Imports the PyTorch reference from /root/reference (read-only, used purely
as a test oracle — none of its code ships in the framework), feeds both
stacks the same synthetic dataset and the same converted weights, and
requires matching outputs on the deterministic paths:

  * full-mode predict (deterministic balanced bank, same ordering);
  * knn-mode predict (deterministic given features);
  * episodic training forward with an explicitly pinned support episode;
  * support influence on identical probabilities/weights.
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"


@pytest.fixture(scope="module")
def reference_modules():
    torch = pytest.importorskip("torch")
    # The reference imports hnswlib at module scope; stub it (we compare the
    # exact-knn path, not hnsw).
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
    # APPEND (not prepend): the reference also has a top-level train.py and
    # would shadow this repo's train.py for later tests.
    if REF not in sys.path:
        sys.path.append(REF)
    import importlib

    ref_nw = importlib.import_module("nwhead.nw")
    ref_metric = importlib.import_module("util.metric")
    return ref_nw, ref_metric


class TorchSyntheticDataset:
    """Reference-protocol dataset: __getitem__ -> (NCHW tensor, label)."""

    def __init__(self, images_nhwc, targets):
        import torch

        self.images = torch.from_numpy(images_nhwc.transpose(0, 3, 1, 2)).float()
        self.targets = np.asarray(targets)
        self.num_classes = int(self.targets.max()) + 1

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx):
        import torch

        return self.images[idx], torch.tensor(self.targets[idx])


@pytest.fixture(scope="module")
def parity_setup(reference_modules):
    import torch
    from torch_oracles import torch_resnet18

    from nwhead_tpu.data import ArrayDataset
    from nwhead_tpu.models import load_model
    from nwhead_tpu.models.torch_import import load_pretrained
    from nwhead_tpu.nw.net import NWNet

    ref_nw, ref_metric = reference_modules

    rng = np.random.default_rng(0)
    N, C, HW = 64, 4, 32
    targets = np.tile(np.arange(C), N // C)
    images = rng.normal(0, 0.4, size=(N, HW, HW, 3)).astype(np.float32)
    images += (targets / C)[:, None, None, None].astype(np.float32)

    torch.manual_seed(0)
    t_feat = torch_resnet18()
    # Randomized running stats so eval-mode BN is non-trivial.
    sd = t_feat.state_dict()
    g = torch.Generator().manual_seed(1)
    for k, v in sd.items():
        if k.endswith("running_mean"):
            sd[k] = torch.randn(v.shape, generator=g) * 0.05
        elif k.endswith("running_var"):
            sd[k] = torch.rand(v.shape, generator=g) * 0.5 + 0.75
    t_feat.load_state_dict(sd)

    t_ds = TorchSyntheticDataset(images, targets)
    ref_net = ref_nw.NWNet(
        t_feat, C, support_dataset=t_ds, feat_dim=512,
        n_shot=2, n_shot_full=8, n_shot_cluster=2, n_neighbors=3,
        device="cpu",
    )
    ref_net.eval()

    j_ds = ArrayDataset(images, targets, num_classes=C)
    j_feat = load_model("resnet18")
    net = NWNet(
        j_feat, C, support_dataset=j_ds, feat_dim=512,
        n_shot=2, n_shot_full=8, n_shot_cluster=2, n_neighbors=3, seed=0,
    )
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(images[:2]))
    feat_vars = {
        "params": variables["params"]["featurizer"],
        "batch_stats": variables["batch_stats"]["featurizer"],
    }
    feat_vars = load_pretrained(feat_vars, t_feat.state_dict(), "resnet18")
    variables = {
        "params": {**variables["params"], "featurizer": feat_vars["params"]},
        "batch_stats": {**variables["batch_stats"], "featurizer": feat_vars["batch_stats"]},
    }

    import torch as _t

    with _t.no_grad():
        ref_net.precompute()
    net.precompute(variables)
    return ref_net, net, variables, images, targets


def test_full_bank_matches(parity_setup):
    ref_net, net, variables, images, targets = parity_setup
    ref_feat = ref_net.full_feat.numpy()
    our_feat = np.asarray(net.full_feat)
    assert ref_feat.shape == our_feat.shape
    np.testing.assert_array_equal(ref_net.full_y.numpy(), np.asarray(net.full_y))
    np.testing.assert_allclose(our_feat, ref_feat, rtol=1e-2, atol=2e-3)


def test_full_mode_predict_matches(parity_setup):
    import torch

    ref_net, net, variables, images, targets = parity_setup
    x = images[:8]
    with torch.no_grad():
        want = ref_net.predict(torch.from_numpy(x.transpose(0, 3, 1, 2)), "full").numpy()
    got = np.asarray(net.predict(variables, jnp.asarray(x), "full"))
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-3)
    # Class decisions must agree exactly.
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_knn_mode_predict_matches(parity_setup):
    import torch

    ref_net, net, variables, images, targets = parity_setup
    x = images[:4]
    with torch.no_grad():
        want = ref_net.predict(torch.from_numpy(x.transpose(0, 3, 1, 2)), "knn").numpy()
    got = np.asarray(net.predict(variables, jnp.asarray(x), "knn"))
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-3)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_train_forward_matches_with_pinned_support(parity_setup):
    """Episodic forward with the SAME support episode: the train-mode BN
    (joint query+support batch) and joint-graph head must agree."""
    import torch

    ref_net, net, variables, images, targets = parity_setup
    q = images[:3]
    qy = targets[:3]
    sidx = np.array([0, 1, 4, 5, 8, 9])  # classes 0,1,0,1,0,1
    sy = targets[sidx]
    sx = images[sidx]

    # train() forward UPDATES BN running stats in-place even under
    # no_grad; the fixture is module-scoped, so restore the exact state
    # afterwards or every later featurizer-dependent parity test compares
    # a drifted torch net against our undrifted `variables`.
    sd_before = {k: v.clone() for k, v in ref_net.state_dict().items()}
    ref_net.train()
    with torch.no_grad():
        want = ref_net.forward(
            torch.from_numpy(q.transpose(0, 3, 1, 2)),
            torch.from_numpy(qy),
            support_data=(
                torch.from_numpy(sx.transpose(0, 3, 1, 2)),
                torch.from_numpy(sy),
                torch.zeros(len(sy)),
            ),
        ).numpy()
    ref_net.eval()
    ref_net.load_state_dict(sd_before)

    got, isin, _ = net.forward(
        variables, jnp.asarray(q), qy,
        support_data=(jnp.asarray(sx), sy, None),
    )
    got = np.asarray(got)
    np.testing.assert_array_equal(isin, np.isin(qy, sy))
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=1e-2)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_support_influence_matches_reference_fn(parity_setup):
    """Our vectorized influence vs the reference's loop implementation, on
    identical probability/weight inputs."""
    import torch

    ref_net, net, variables, images, targets = parity_setup
    _, ref_metric = None, sys.modules["util.metric"]

    from nwhead_tpu.ops.influence import support_influence
    from nwhead_tpu.ops.nw import nw_probs_and_weights

    qfeat = np.asarray(net._featurize_eval(variables, jnp.asarray(images[:1])))
    sfeat = np.asarray(net.full_feat)
    sy = np.asarray(net.full_y)
    probs, weights = nw_probs_and_weights(
        jnp.asarray(qfeat), jnp.asarray(sfeat), jnp.asarray(sy), net.n_classes
    )
    got = np.asarray(
        support_influence(probs, jnp.asarray(targets[:1]), weights, jnp.asarray(sy))
    )

    qlabel_oh = torch.nn.functional.one_hot(
        torch.from_numpy(targets[:1]).long(), net.n_classes
    ).float()
    slabel_oh = torch.nn.functional.one_hot(
        torch.from_numpy(sy).long(), net.n_classes
    ).float()[None]
    want = ref_metric.support_influence(
        torch.from_numpy(np.asarray(probs)),
        qlabel_oh,
        torch.from_numpy(np.asarray(weights)),
        slabel_oh,
    ).numpy()
    np.testing.assert_allclose(got[0], want.reshape(-1), rtol=1e-3, atol=1e-4)


def test_training_outcome_parity(reference_modules):
    """Train the actual reference (torch) and our stack with identical data,
    architecture, and hyperparameters (independent RNG streams): final
    full-mode accuracy must agree within a tolerance band.

    One-off validation run: both landed on exactly 41.7% (25/60)."""
    import torch
    import torch.nn as tnn
    import flax.linen as fnn

    ref_nw, _ = reference_modules
    C, Ntr, Nte = 6, 120, 60
    r = np.random.default_rng(0)
    pats = r.normal(0, 1, (C, 16, 16, 3)).astype(np.float32)

    def make(n, seed):
        rr = np.random.default_rng(seed)
        y = np.tile(np.arange(C), n // C)
        x = pats[y] * 0.6 + rr.normal(0, 1, (n, 16, 16, 3)).astype(np.float32)
        return x.astype(np.float32), y

    xtr, ytr = make(Ntr, 1)
    xte, yte = make(Nte, 2)

    # --- reference (torch) ---
    class TorchTiny(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv = tnn.Conv2d(3, 16, 3, padding=1)
            self.bn = tnn.BatchNorm2d(16)
            self.fc = tnn.Linear(16, 32)

        def forward(self, x):
            h = torch.relu(self.bn(self.conv(x)))
            return self.fc(h.mean(dim=(2, 3)))

    tds = TorchSyntheticDataset(xtr, ytr)
    torch.manual_seed(0)
    # The REFERENCE episodic sampler draws from numpy's GLOBAL RNG
    # (nwhead/utils.py uses np.random.*): pin it so this test doesn't
    # depend on whatever state earlier tests left behind (was flaky
    # under full-suite ordering).
    np.random.seed(1234)
    ref = ref_nw.NWNet(TorchTiny(), C, support_dataset=tds, feat_dim=32,
                       n_shot=2, n_way=4, n_shot_full=10, device="cpu")
    opt = torch.optim.SGD(ref.parameters(), lr=0.05, momentum=0.9,
                          nesterov=True, weight_decay=1e-4)
    crit = torch.nn.NLLLoss()
    ref.train()
    for epoch in range(12):
        perm = np.random.default_rng(10 + epoch).permutation(Ntr)
        for s0 in range(0, Ntr - 3, 4):
            idx = perm[s0 : s0 + 4]
            img = torch.from_numpy(xtr[idx].transpose(0, 3, 1, 2))
            lab = torch.from_numpy(ytr[idx])
            opt.zero_grad()
            loss = crit(ref(img, lab), lab)
            loss.backward()
            opt.step()
    ref.eval()
    with torch.no_grad():
        ref.precompute()
        correct = 0
        for s0 in range(0, Nte, 4):
            img = torch.from_numpy(xte[s0 : s0 + 4].transpose(0, 3, 1, 2))
            correct += int(
                (ref.predict(img, "full").argmax(-1).numpy() == yte[s0 : s0 + 4]).sum()
            )
    ref_acc = 100 * correct / Nte

    # --- ours (jax) ---
    from nwhead_tpu.data import ArrayDataset
    from nwhead_tpu.nw.net import NWNet
    from nwhead_tpu.train import NWTrainer

    class FlaxTiny(fnn.Module):
        @fnn.compact
        def __call__(self, x, train: bool = True):
            h = fnn.Conv(16, (3, 3), padding="SAME")(x)
            h = fnn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
            h = fnn.relu(h)
            return fnn.Dense(32)(jnp.mean(h, axis=(1, 2)))

    ds_tr = ArrayDataset(xtr, ytr, num_classes=C)
    ds_te = ArrayDataset(xte, yte, num_classes=C)
    net = NWNet(FlaxTiny(), C, support_dataset=ds_tr, feat_dim=32,
                n_shot=2, n_way=4, n_shot_full=10, seed=0)
    trainer = NWTrainer(net, ds_tr, ds_te, lr=0.05, batch_size=4,
                        milestones=(100,), eval_modes=("full",), seed=0)
    for _ in range(12):
        trainer.train_epoch()
        trainer.reset_metrics()
    ours_acc = trainer.eval_all_modes()

    # Independent inits/sampling streams -> allow a band; both stacks must
    # clear chance (16.7%) decisively and agree.
    assert ref_acc > 30 and ours_acc > 30, (ref_acc, ours_acc)
    assert abs(ours_acc - ref_acc) < 15, (ref_acc, ours_acc)


def test_cluster_pipeline_matches_reference(parity_setup, reference_modules):
    """Cluster-mode oracle at the feature level: on unambiguous per-class
    subclusters, the reference's sklearn compute_clusters and our jit'd
    Lloyd produce the SAME centroid sets (up to order), and the NW head
    over those supports produces the same log-probs. (Direct image-level
    decision parity is not assertable: different k-means local optima
    legitimately yield different decisions on marginal features — on the
    shared fixture our stack scores 7/8 vs the reference's 3/8.)"""
    import importlib

    import torch

    from nwhead_tpu.ops.kmeans import compute_clusters as our_clusters
    from nwhead_tpu.ops.nw import nw_log_probs

    ref_utils = importlib.import_module("nwhead.utils")

    rng = np.random.default_rng(3)
    C, per, D, k = 3, 12, 16, 2
    feats, labels = [], []
    for c in range(C):
        for sub in range(k):
            center = np.zeros(D, np.float32)
            center[c] = 10.0
            center[C + c] = 5.0 * sub  # two clear subclusters per class
            feats.append(center + 0.05 * rng.standard_normal(
                (per // k, D)).astype(np.float32))
            labels += [c] * (per // k)
    feats = np.concatenate(feats)
    labels = np.asarray(labels)

    ref_f, ref_y = ref_utils.compute_clusters(
        torch.from_numpy(feats), torch.from_numpy(labels), k, closest=True
    )
    our_f, our_y = our_clusters(feats, labels, k, closest=True, seed=0)
    assert our_f.shape == tuple(ref_f.shape)
    np.testing.assert_array_equal(np.sort(ref_y.numpy()), np.sort(our_y))
    # Same centroid SET per class (order within a class is arbitrary).
    for c in range(C):
        r = np.sort(ref_f.numpy()[ref_y.numpy() == c], axis=0)
        o = np.sort(np.asarray(our_f)[our_y == c], axis=0)
        np.testing.assert_allclose(o, r, rtol=1e-4, atol=1e-4)

    # And the NW head over the cluster support agrees end to end.
    q = feats[::7][:5]
    ref_net, _, _, _, _ = parity_setup
    with torch.no_grad():
        want = ref_net.nwhead(
            torch.from_numpy(q),
            torch.from_numpy(np.asarray(ref_f)),
            torch.from_numpy(ref_y.numpy()),
        ).numpy()
    # ref_net.nwhead one-hots to the NET's class count (4) — match it;
    # the extra class column is the log-floor on both sides.
    got = np.asarray(nw_log_probs(
        jnp.asarray(q), jnp.asarray(our_f), jnp.asarray(our_y),
        ref_net.n_classes,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_sklearn_cluster_impl_bit_exact(reference_modules):
    """``compute_clusters(impl='sklearn')`` is BIT-identical to the
    reference's sklearn path (``nwhead/utils.py:218-246``) on ambiguous
    random blobs — data where different k-means local optima are real, so
    the behavioral device-Lloyd test above cannot assert exact equality.
    Covers closest=False (the reference's actual call, ``support.py:123``
    passes the default) and closest=True."""
    import importlib

    import torch

    from nwhead_tpu.ops.kmeans import compute_clusters as our_clusters

    ref_utils = importlib.import_module("nwhead.utils")

    rng = np.random.default_rng(7)
    C, D, k = 5, 24, 3
    feats, labels = [], []
    for c in range(C):
        n = int(rng.integers(9, 17))  # uneven class sizes
        feats.append(rng.standard_normal((n, D)).astype(np.float32))
        labels += [c] * n
    feats = np.concatenate(feats)
    labels = np.asarray(labels)

    for closest in (False, True):
        ref_f, ref_y = ref_utils.compute_clusters(
            torch.from_numpy(feats.copy()),
            torch.from_numpy(labels.copy()),
            k,
            closest=closest,
        )
        our_f, our_y = our_clusters(
            feats, labels, k, closest=closest, impl="sklearn"
        )
        np.testing.assert_array_equal(ref_y.numpy(), our_y)
        np.testing.assert_array_equal(ref_f.numpy(), our_f)


def test_cluster_mode_net_parity_with_sklearn_impl(parity_setup):
    """End-to-end cluster-mode predict parity: NWNet(cluster_impl='sklearn')
    runs the reference's exact per-class KMeans(random_state=0) on its own
    feature bank, so the one remaining source of cluster-mode divergence is
    featurizer float noise — decisions must agree exactly, log-probs to the
    same tolerance as the full/knn oracle tests."""
    import torch

    from nwhead_tpu.data import ArrayDataset
    from nwhead_tpu.models import load_model
    from nwhead_tpu.nw.net import NWNet

    ref_net, _, variables, images, targets = parity_setup
    C = int(targets.max()) + 1

    net = NWNet(
        load_model("resnet18"), C,
        support_dataset=ArrayDataset(images, targets, num_classes=C),
        feat_dim=512, n_shot=2, n_shot_full=8, n_shot_cluster=2,
        n_neighbors=3, seed=0, cluster_impl="sklearn",
    )
    net.precompute(variables)

    # The k-means inputs (feature banks) agree to float tolerance and the
    # clustering call is identical — centroids must agree tightly.
    ref_cf = ref_net.support_eval.cluster_feat.numpy()
    np.testing.assert_array_equal(
        ref_net.support_eval.cluster_y.numpy(),
        np.asarray(net.support_eval.cluster_y),
    )
    np.testing.assert_allclose(
        np.asarray(net.support_eval.cluster_feat), ref_cf, rtol=5e-2, atol=5e-3
    )

    x = images[:8]
    with torch.no_grad():
        want = ref_net.predict(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), "cluster"
        ).numpy()
    got = np.asarray(net.predict(variables, jnp.asarray(x), "cluster"))
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-3)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))
