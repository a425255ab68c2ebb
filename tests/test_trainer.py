"""Trainer-layer unit tests: milestone LR schedule, featurizer freeze mask,
CLI resume round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_multistep_lr_matches_torch_semantics():
    """MultiStepLR: lr * gamma^(#milestones passed), stepped per epoch
    (train.py:248-250)."""
    from nwhead_tpu.train import multistep_lr

    sched = multistep_lr(0.1, milestones=(2, 4), gamma=0.1, steps_per_epoch=5)
    # epoch 0-1 (steps 0..9): 0.1 ; epochs 2-3: 0.01 ; epoch 4+: 0.001
    assert float(sched(0)) == pytest.approx(0.1)
    assert float(sched(9)) == pytest.approx(0.1)
    assert float(sched(10)) == pytest.approx(0.01)
    assert float(sched(19)) == pytest.approx(0.01)
    assert float(sched(20)) == pytest.approx(0.001)


def test_featurizer_freeze_mask_zeroes_updates():
    import flax.linen as nn
    import optax

    from nwhead_tpu.train import featurizer_freeze_mask, make_optimizer

    params = {
        "featurizer": {"conv": {"kernel": jnp.ones((3, 3))}},
        "head": {"dense": {"kernel": jnp.ones((3, 3))}},
    }
    mask = featurizer_freeze_mask(params)
    assert mask["featurizer"]["conv"]["kernel"] is True
    assert mask["head"]["dense"]["kernel"] is False

    tx = make_optimizer(0.1, (10,), 0.1, 1, weight_decay=0.0, freeze_mask=mask)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["featurizer"]["conv"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(updates["head"]["dense"]["kernel"]).max()) > 0.0


def test_cli_resume_roundtrip(tmp_path):
    """train.py --resume restores state and continues at the right epoch."""
    import train as T

    common = [
        "--dataset", "synthetic", "--models_dir", str(tmp_path),
        "--batch_size", "3", "--n_way", "3",
        "--n_shot", "1", "--lr", "0.05", "--log_interval", "1",
        "--num_steps_per_epoch", "2", "--num_val_steps_per_epoch", "1",
    ]
    T.main(common + ["--num_epochs", "2"])
    # Continue for 2 more epochs from the checkpoints.
    T.main(common + ["--num_epochs", "4", "--resume"])

    import os

    run_dir = next(p for p in tmp_path.iterdir() if p.is_dir())
    ckpts = sorted(os.listdir(run_dir / "checkpoints"))
    # epochs 1..4 checkpointed (+ best copy)
    assert "model.0004" in ckpts


def test_resume_matches_uninterrupted_control(tmp_path):
    """Kill/resume parity, bitwise: a run split by --resume must land on
    EXACTLY the params an uninterrupted control produces. Works because
    checkpoints carry the full optimizer state, the LR schedule is a pure
    function of the restored step, and the sampler-RNG sidecar restores
    the episodic/batcher Generators mid-stream (train.py). The synthetic
    dataset is transform-free, so those Generators are the only
    stochastic surface; with stochastic image transforms the claim is
    distributional (thread-local transform rngs are not captured)."""
    import os

    import numpy as np

    import jax
    import train as T

    def run(models_dir, epochs, resume=False):
        argv = [
            "--dataset", "synthetic", "--models_dir", str(models_dir),
            "--batch_size", "3", "--n_way", "3", "--n_shot", "1",
            "--lr", "0.05", "--log_interval", "1",
            "--num_steps_per_epoch", "2", "--num_val_steps_per_epoch", "1",
            "--num_epochs", str(epochs), "--seed", "3",
        ] + (["--resume"] if resume else [])
        T.main(argv)

    control = tmp_path / "control"
    split = tmp_path / "split"
    run(control, 4)
    run(split, 2)
    run(split, 4, resume=True)

    def final_ckpt(root):
        run_dir = next(p for p in root.iterdir() if p.is_dir())
        path = os.path.join(run_dir, "checkpoints", "model.0004")
        from nwhead_tpu.train import load_checkpoint

        return load_checkpoint(path)

    a = final_ckpt(control)
    b = final_ckpt(split)
    flat_a = jax.tree_util.tree_leaves_with_path(a["params"])
    flat_b = jax.tree_util.tree_leaves_with_path(b["params"])
    assert len(flat_a) == len(flat_b)
    for (ka, va), (kb, vb) in zip(flat_a, flat_b):
        assert ka == kb
        assert np.array_equal(np.asarray(va), np.asarray(vb)), ka
    for (ka, va), (kb, vb) in zip(
        jax.tree_util.tree_leaves_with_path(a["opt_state"]),
        jax.tree_util.tree_leaves_with_path(b["opt_state"]),
    ):
        assert np.array_equal(np.asarray(va), np.asarray(vb)), ka


def test_eval_covers_tail_batch():
    """Eval must include the last partial batch (the reference evaluates
    every sample)."""
    from nwhead_tpu.data import make_synthetic_dataset
    from nwhead_tpu.nw.net import NWNet
    from nwhead_tpu.train import NWTrainer
    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = True):
            x = nn.Conv(4, (3, 3), padding="SAME")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
            return jnp.mean(nn.relu(x), axis=(1, 2))

    train_ds = make_synthetic_dataset(n=20, n_classes=2, size=8, seed=0)
    val_ds = make_synthetic_dataset(n=7, n_classes=2, size=8, seed=1)  # 7 % 3 != 0
    net = NWNet(Tiny(), n_classes=2, support_dataset=train_ds, feat_dim=4,
                n_shot=1, n_shot_full=3, n_shot_cluster=1, seed=0)
    trainer = NWTrainer(net, train_ds, val_ds, batch_size=3,
                        eval_modes=("full",), seed=0)
    net.precompute(trainer.state.variables())
    trainer.eval_epoch("full")
    assert trainer.val_metrics["acc:val:full"].num_samples == 7


def test_irm_digits_script_smoke():
    """scripts/irm_digits.py (the real-data IRM + ensemble demo) runs its
    full path on a tiny budget: env-shifted digits, single-env episodic
    training, full + ensemble eval."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "irm_digits",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "irm_digits.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    report = mod.main(["--epochs", "1", "--steps_per_epoch", "2"])
    assert set(report["irm"]) == {"full", "ensemble"}
    assert 0 <= report["irm"]["ensemble"]["acc"] <= 100


def test_irm_digits_reference_stack_smoke():
    """--stacks reference drives the torch reference's IRM training
    (single-env episodes) and ensemble predict on the same env-shifted
    digits — the head-to-head for the NeurIPS-2023 extension."""
    import importlib.util
    import os

    pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location(
        "irm_digits",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "irm_digits.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    report = mod.main([
        "--epochs", "1", "--steps_per_epoch", "2", "--stacks", "reference",
    ])
    assert set(report["reference_irm"]) == {"full", "ensemble"}
    m = report["reference_irm"]["ensemble"]
    assert np.isfinite([m["acc"], m["nll"], m["ece"]]).all()
