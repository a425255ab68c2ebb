"""Backbone parity tests: convert random torchvision weights into our Flax
models and require feature-level agreement — validates conv padding, BN
semantics, pooling, and the weight importer in one shot."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nwhead_tpu.models import load_model, feature_dim, MODEL_NAMES
from nwhead_tpu.models.torch_import import load_pretrained


def _parity(arch, torch_model, size=64, atol=5e-3):
    # atol covers accumulated fp32 conv-ordering noise (XLA vs torch) through
    # deep stacks; a padding/BN semantic bug shows up orders of magnitude larger.
    import torch

    # Randomize BN running stats too, so eval-mode parity is non-trivial.
    sd = torch_model.state_dict()
    g = torch.Generator().manual_seed(7)
    for k, v in sd.items():
        if k.endswith("running_mean"):
            sd[k] = torch.randn(v.shape, generator=g) * 0.1
        elif k.endswith("running_var"):
            sd[k] = torch.rand(v.shape, generator=g) + 0.5
    torch_model.load_state_dict(sd)
    torch_model.eval()

    model = load_model(arch)
    x = np.random.default_rng(0).standard_normal((2, size, size, 3)).astype(np.float32)

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    variables = load_pretrained(variables, torch_model.state_dict(), arch)

    got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        want = torch_model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=atol)


def test_resnet18_matches_torch_oracle():
    from torch_oracles import torch_resnet18

    _parity("resnet18", torch_resnet18())


@pytest.mark.skipif(
    not __import__("os").environ.get("RUN_SLOW"),
    reason="slow on CPU backend; set RUN_SLOW=1",
)
def test_resnet50_matches_torch_oracle():
    from torch_oracles import torch_resnet50

    _parity("resnet50", torch_resnet50())


@pytest.mark.skipif(
    not __import__("os").environ.get("RUN_SLOW"),
    reason="grouped-conv compile is very slow on CPU backend; set RUN_SLOW=1",
)
def test_resnext50_matches_torch_oracle():
    from torch_oracles import torch_resnext50_32x4d

    _parity("resnext50_32x4d", torch_resnext50_32x4d())


def test_densenet121_matches_torch_oracle():
    from torch_oracles import torch_densenet121

    _parity("densenet121", torch_densenet121())


def test_feature_dims():
    # train.py:200-214 pins resnet18 -> 512, densenet121 -> 1024.
    assert feature_dim("resnet18") == 512
    assert feature_dim("resnet50") == 2048
    assert feature_dim("densenet121") == 1024
    assert feature_dim("densenet161") == 2208
    assert feature_dim("CIFAR_ResNet18") == 512


@pytest.mark.parametrize("arch", ["CIFAR_ResNet18", "CIFAR_DenseNet121"])
def test_cifar_models_forward(arch):
    model = load_model(arch)
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, model.feat_dim)
    # train mode updates batch_stats
    out2, updates = model.apply(
        model.init(jax.random.PRNGKey(0), x, train=True),
        x,
        train=True,
        mutable=["batch_stats"],
    )
    assert out2.shape == (2, model.feat_dim)
    assert "batch_stats" in updates


def test_registry_rejects_unknown():
    with pytest.raises(KeyError):
        load_model("nope")
    assert "resnet18" in MODEL_NAMES


def test_vit_matches_torch_oracle():
    """ViT parity through the DINOv2-format checkpoint converter."""
    import torch
    from torch_oracles import TorchViT
    from nwhead_tpu.models.vit import VisionTransformer
    from nwhead_tpu.models.torch_import import load_pretrained

    torch.manual_seed(0)
    oracle = TorchViT(patch=14, dim=96, depth=3, heads=4, img_size=56)
    oracle.eval()

    model = VisionTransformer(
        patch_size=14, embed_dim=96, depth=3, num_heads=4, img_size=56
    )
    x = np.random.default_rng(0).standard_normal((2, 56, 56, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    variables = load_pretrained(variables, oracle.state_dict(), "vit_custom")

    got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        want = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


def test_vit_pos_embed_interpolation():
    """Input size different from the stored pos-embed grid must still work."""
    from nwhead_tpu.models import load_model

    m = load_model("vit_s16")
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), train=False)
    out = m.apply(v, jnp.zeros((2, 160, 160, 3)), train=False)
    assert out.shape == (2, 384)


def test_vit_registry():
    from nwhead_tpu.models import feature_dim

    assert feature_dim("dinov2_vits14") == 384  # train.py:212-214


def test_s2d_stem_exact_reparameterization(rng):
    """The space-to-depth stem (stem='s2d') with s2d_stem_kernel-transformed
    weights must reproduce the conv7 stem bit-for-bit-ish at f32 — it is an
    exact reparameterization of the 7x7/s2 convolution."""
    import jax
    import jax.numpy as jnp

    from nwhead_tpu.models import load_model
    from nwhead_tpu.models.resnet import s2d_stem_kernel

    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))

    m7 = load_model("resnet10")
    v7 = m7.init(jax.random.PRNGKey(0), x, train=False)

    ms = load_model("resnet10", stem="s2d")
    vs = ms.init(jax.random.PRNGKey(0), x, train=False)

    # Copy every parameter; transform only the stem kernel.
    p = jax.tree_util.tree_map(lambda a: a, v7["params"])
    p = dict(p)
    p["conv1"] = {"kernel": jnp.asarray(s2d_stem_kernel(v7["params"]["conv1"]["kernel"]))}
    vs = {"params": p, "batch_stats": v7["batch_stats"]}

    out7 = np.asarray(m7.apply(v7, x, train=False))
    outs = np.asarray(ms.apply(vs, x, train=False))
    np.testing.assert_allclose(outs, out7, rtol=1e-5, atol=1e-5)


def test_s2d_stem_pretrained_import(tmp_path, rng):
    """A conv7-stem torch checkpoint imports into an s2d-stem model: the
    merge transforms conv1 (7,7,3,64) -> (4,4,12,64) and features match the
    conv7 model loaded from the same checkpoint."""
    import sys

    import jax
    import jax.numpy as jnp

    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    try:
        from model.resnet import resnet18 as ref_resnet18
    finally:
        sys.path.remove("/root/reference")

    from nwhead_tpu.models import load_model
    from nwhead_tpu.models.torch_import import load_pretrained

    sd = ref_resnet18().state_dict()
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))

    m7 = load_model("resnet18")
    v7 = load_pretrained(m7.init(jax.random.PRNGKey(0), x, train=False), sd, "resnet18")
    ms = load_model("resnet18", stem="s2d")
    vs = load_pretrained(ms.init(jax.random.PRNGKey(1), x, train=False), sd, "resnet18")

    out7 = np.asarray(m7.apply(v7, x, train=False))
    outs = np.asarray(ms.apply(vs, x, train=False))
    np.testing.assert_allclose(outs, out7, rtol=1e-4, atol=1e-5)


def test_importer_on_trained_weights_real_data(tmp_path):
    """The importer previously only ever saw random weights. Here the torch
    oracle resnet18 TRAINS on real images (sklearn digits) for a few steps
    — real gradients, real BN running statistics accumulated from real
    batches — the checkpoint goes through torch.save, and feature parity
    must hold through the full disk -> load_state_dict_file ->
    load_pretrained pipeline on held-out real images."""
    import torch
    from torch_oracles import torch_resnet18

    from nwhead_tpu.data import make_digits_dataset
    from nwhead_tpu.models.torch_import import (
        load_pretrained, load_state_dict_file,
    )

    tr = make_digits_dataset(True)
    va = make_digits_dataset(False)

    tmodel = torch_resnet18()
    head = torch.nn.Linear(512, 10)
    opt = torch.optim.SGD(
        list(tmodel.parameters()) + list(head.parameters()), lr=1e-2,
        momentum=0.9,
    )
    tmodel.train()
    rng = np.random.default_rng(0)
    for _ in range(6):  # real gradient steps on real batches
        idx = rng.choice(len(tr), 16, replace=False)
        x = torch.from_numpy(
            tr.images[idx].transpose(0, 3, 1, 2).copy()
        )
        y = torch.from_numpy(tr.targets[idx])
        opt.zero_grad()
        loss = torch.nn.functional.cross_entropy(head(tmodel(x)), y)
        loss.backward()
        opt.step()
    tmodel.eval()

    ckpt = str(tmp_path / "trained_resnet18.pth")
    torch.save({"state_dict": tmodel.state_dict()}, ckpt)

    model = load_model("resnet18")
    xq = va.images[:8]
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(xq), train=False)
    variables = load_pretrained(
        variables, load_state_dict_file(ckpt), "resnet18"
    )
    got = np.asarray(model.apply(variables, jnp.asarray(xq), train=False))
    with torch.no_grad():
        want = tmodel(torch.from_numpy(xq.transpose(0, 3, 1, 2).copy())).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-3)
    # The trained features are non-degenerate (BN stats really moved).
    assert np.abs(got).max() > 0.01
