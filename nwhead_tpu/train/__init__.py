from nwhead_tpu.train.trainer import (
    FCTrainer,
    NWTrainer,
    TrainState,
    featurizer_freeze_mask,
    make_optimizer,
    multistep_lr,
)
from nwhead_tpu.train.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from nwhead_tpu.train.config import Parser, ParseKwargs, initialize_wandb, parse_bool

__all__ = [
    "FCTrainer",
    "NWTrainer",
    "TrainState",
    "featurizer_freeze_mask",
    "make_optimizer",
    "multistep_lr",
    "latest_checkpoint",
    "load_checkpoint",
    "save_checkpoint",
    "Parser",
    "ParseKwargs",
    "initialize_wandb",
    "parse_bool",
]
