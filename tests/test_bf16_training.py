"""bf16-bank training quality: training THROUGH the fused kernel's bf16
path (forward + custom-VJP backward on bf16-cast features) must reach
accuracy parity with the f32 head on the synthetic task.

Validates the VERDICT round-1 gap: "bf16-bank backward works via the same
kernels but is untested for training quality". Outcome documented in
CLAUDE.md: the training default stays f32; bf16 is the serving-bank option.

Runs in the default suite (the fused kernel executes in interpret mode on
CPU; tiny shapes keep it ~15s).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nwhead_tpu.data import make_synthetic_dataset
from nwhead_tpu.nw.net import NWNet
from nwhead_tpu.train.trainer import NWTrainer


def _train(head_precision: str, epochs: int = 5) -> float:
    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = True):
            x = nn.Conv(8, (3, 3), padding="SAME")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
            x = nn.relu(x)
            x = jnp.mean(x, axis=(1, 2))
            return nn.Dense(16)(x)

    train_ds = make_synthetic_dataset(n=48, n_classes=4, size=8, seed=0)
    val_ds = make_synthetic_dataset(n=16, n_classes=4, size=8, seed=1)
    net = NWNet(
        Tiny(),
        n_classes=4,
        support_dataset=train_ds,
        feat_dim=16,
        n_shot=2,
        n_way=3,
        n_shot_full=5,
        head_precision=head_precision,
        fused_min_support=1,  # force every episode through the fused kernel
        seed=0,
    )
    trainer = NWTrainer(
        net, train_ds, val_ds, lr=0.05, batch_size=3, milestones=(100,),
        seed=0, eval_modes=("full",),
    )
    for _ in range(epochs):
        trainer.train_epoch()
    return trainer.eval_all_modes()


def test_bf16_head_training_parity():
    acc_f32 = _train("f32")
    acc_bf16 = _train("bf16")
    assert acc_f32 > 60.0, acc_f32
    # bf16 bank/query cast must not cost more than a few points on a task
    # the f32 head solves.
    assert acc_bf16 >= acc_f32 - 7.0, (acc_f32, acc_bf16)
