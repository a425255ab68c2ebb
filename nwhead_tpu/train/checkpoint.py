"""Checkpointing (orbax) with a wired resume path.

The reference saves ``{'epoch', 'network_state_dict', 'optimizer',
'scheduler'}`` via ``torch.save`` every ``log_interval`` epochs with a
``model.best.h5`` copy (``util/utils.py:55-68``) — but never calls
``load_checkpoint`` from the active train loop (no resume; SURVEY.md §5.3).
Here: orbax checkpoints of the full train state (params, batch_stats,
opt_state, epoch — the LR schedule is a pure function of the step so it
resumes for free) plus a working ``restore``.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp


def _path(ckpt_dir: str, name: str) -> str:
    return os.path.join(os.path.abspath(ckpt_dir), name)


def save_checkpoint(
    epoch: int,
    state: Dict[str, Any],
    ckpt_dir: str,
    is_best: bool = False,
) -> str:
    """Save the train-state pytree as ``model.{epoch:04d}`` (+ ``model.best``
    copy, mirroring util/utils.py:64-68)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    name = f"model.{epoch:04d}"
    path = _path(ckpt_dir, name)
    ckpt = dict(state)
    ckpt["epoch"] = epoch
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, ckpt, force=True)
    if is_best:
        best = _path(ckpt_dir, "model.best")
        if os.path.exists(best):
            shutil.rmtree(best)
        shutil.copytree(path, best)
    return path


def load_checkpoint(path: str, target: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Restore a checkpoint; ``target`` (a matching pytree of arrays) guides
    restoration dtypes/shapes when provided."""
    with ocp.PyTreeCheckpointer() as ckptr:
        if target is not None:
            tgt = dict(target)
            tgt.setdefault("epoch", 0)
            try:
                return ckptr.restore(path, item=tgt)
            except ValueError:
                # Partial target: eval.py/serve.py ask only for
                # params(+batch_stats) from a train.py checkpoint that also
                # holds opt_state — orbax refuses the structure mismatch, so
                # restore raw and take the requested subtrees.
                raw = ckptr.restore(path)
                return {k: raw.get(k, tgt[k]) for k in tgt}
        return ckptr.restore(path)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Path of the newest ``model.NNNN`` checkpoint, or None."""
    if not os.path.isdir(ckpt_dir):
        return None
    cands = [
        n
        for n in os.listdir(ckpt_dir)
        if n.startswith("model.") and n.split(".")[-1].isdigit()
    ]
    if not cands:
        return None
    return _path(ckpt_dir, max(cands, key=lambda n: int(n.split(".")[-1])))
