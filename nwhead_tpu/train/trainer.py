"""Training/eval loops for NW-head and FC-head networks.

Functional re-design of the reference trainer (``train.py:116-422``):
  * optax SGD(momentum=0.9, nesterov) + decoupled-from-schedule L2 weight
    decay added to the gradient (torch SGD semantics, ``train.py:243-247``);
  * MultiStepLR: piecewise-constant schedule with milestone decays
    (``train.py:248-250``), a pure function of the step -> resumes for free;
  * NLL loss on log-probs (``train.py:242``);
  * eval-before-train epoch order with per-mode NW eval
    (random/full/cluster, ``train.py:287-297``), ECE over the epoch's
    concatenated probabilities x100 (``train.py:373``), best-checkpoint
    keyed on full-mode accuracy (``train.py:305-311``);
  * ``freeze_featurizer`` via an optax mask (``train.py:218-220``).

The device step is one jitted function; episodic support sampling and image
gathering stay on the host (prefetchable via data.pipeline).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nwhead_tpu.ops import metrics as M
from nwhead_tpu.nw.net import NWNet


def multistep_lr(
    base_lr: float, milestones: Sequence[int], gamma: float, steps_per_epoch: int
) -> optax.Schedule:
    """torch ``MultiStepLR`` on epoch milestones, expressed per-step."""
    boundaries = {int(m) * steps_per_epoch: gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def make_optimizer(
    lr: float,
    milestones: Sequence[int],
    gamma: float,
    steps_per_epoch: int,
    weight_decay: float = 1e-4,
    momentum: float = 0.9,
    nesterov: bool = True,
    freeze_mask: Optional[Any] = None,
) -> optax.GradientTransformation:
    """SGD + L2-in-gradient weight decay + milestone schedule (torch-style)."""
    schedule = multistep_lr(lr, milestones, gamma, steps_per_epoch)
    tx = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(schedule, momentum=momentum, nesterov=nesterov),
    )
    if freeze_mask is not None:
        tx = optax.chain(optax.masked(optax.set_to_zero(), freeze_mask), tx)
    return tx


def featurizer_freeze_mask(params: Dict[str, Any]) -> Dict[str, Any]:
    """True for featurizer params (frozen), False elsewhere
    (``--freeze_featurizer``, ``train.py:218-220``)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: any(
            getattr(k, "key", None) == "featurizer" for k in path
        ),
        params,
    )


def _padded_eval_batches(ds, batch_size: int, num_steps: Optional[int]):
    """Sequential eval batches, tail padded to a static shape. Yields
    (padded images f32, UNPADDED labels) — the label length is the number
    of real rows. Padded rows are dropped from every metric downstream."""
    n = len(ds)
    count = 0
    for start in range(0, n, batch_size):
        if num_steps is not None and count >= num_steps:
            break
        idx = np.arange(start, min(start + batch_size, n))
        label = np.asarray(ds.targets[idx])
        img = np.asarray(ds.gather(idx)).astype(np.float32)
        pad = batch_size - len(idx)
        if pad:
            img = np.concatenate([img, np.zeros((pad, *img.shape[1:]), img.dtype)])
        yield img, label
        count += 1


@dataclasses.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: int = 0

    def variables(self) -> Dict[str, Any]:
        return {"params": self.params, "batch_stats": self.batch_stats}


class NWTrainer:
    """Orchestrates NW episodic training + multi-mode eval."""

    def __init__(
        self,
        net: NWNet,
        train_dataset,
        val_dataset,
        lr: float = 1e-3,
        batch_size: int = 1,
        milestones: Sequence[int] = (100, 150),
        gamma: float = 0.1,
        weight_decay: float = 1e-4,
        freeze_featurizer: bool = False,
        eval_modes: Sequence[str] = ("random", "full", "cluster"),
        seed: int = 0,
        mesh=None,
    ) -> None:
        """``mesh``: optional ('data', 'support') mesh — query batches shard
        over 'data' (XLA reduces the grads), the support episode replicates,
        and full-mode eval runs over the support-sharded bank (pass the same
        mesh to the NWNet). batch_size must divide the data axis."""
        self.net = net
        self.train_dataset = train_dataset
        self.val_dataset = val_dataset
        self.batch_size = batch_size
        self.eval_modes = tuple(eval_modes)
        self.rng = np.random.default_rng(seed)
        self.steps_per_epoch = max(1, len(train_dataset) // batch_size)
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            assert batch_size % mesh.shape["data"] == 0, (
                "batch_size must divide the data mesh axis"
            )
            self._data_shard = NamedSharding(mesh, P("data"))
            self._replicated = NamedSharding(mesh, P())

        sample = jnp.asarray(train_dataset.gather(np.arange(min(batch_size, len(train_dataset)))))
        variables = net.init(jax.random.PRNGKey(seed), sample)
        mask = featurizer_freeze_mask(variables["params"]) if freeze_featurizer else None
        # Exposed for per-epoch LR logging (and the endurance runner's
        # schedule-continuity check): LR is a pure function of the global
        # step, so a resumed run's LR trajectory must coincide exactly.
        self.lr_schedule = multistep_lr(lr, milestones, gamma, self.steps_per_epoch)
        self.tx = make_optimizer(
            lr, milestones, gamma, self.steps_per_epoch, weight_decay,
            freeze_mask=mask,
        )
        self.state = TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=self.tx.init(variables["params"]),
        )

        self._train_step = jax.jit(self._train_step_impl)

        # Metric accumulators (train.py:254-279).
        self.metrics = {k: M.Metric() for k in ("loss:train", "acc:train")}
        self.val_metrics = {
            f"{name}:val:{mode}": M.Metric()
            for mode in self.eval_modes
            for name in ("loss", "acc", "ece")
        }

    # -- jitted step ----------------------------------------------------------

    def _train_step_impl(self, params, batch_stats, opt_state, qimg, qy, simg, sy):
        def loss_fn(p):
            log_probs, updates = self.net.model.apply(
                {"params": p, "batch_stats": batch_stats},
                qimg,
                simg,
                sy,
                train=True,
                mutable=["batch_stats"],
            )
            loss = M.nll_loss(log_probs, qy)
            return loss, (log_probs, updates["batch_stats"])

        (loss, (log_probs, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, new_opt_state = self.tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        acc = M.acc(jnp.argmax(log_probs, -1), qy)
        return new_params, new_stats, new_opt_state, loss, acc

    # -- epochs ---------------------------------------------------------------

    def _device_dataset(self):
        """Device-resident copy of an in-memory, transform-free dataset.

        For ArrayDataset-style data with no stochastic transform, every
        train step otherwise SHIPS its images host->device — at the CUB
        recipe shape that is ~11 MB/step of f32 pixels, and on a
        narrow link (the axon tunnel moves ~15-35 MB/s) the link, not
        the chip, sets the training rate. Holding the dataset in HBM
        once (3.6 GB at S=6k/224px) and shipping only INDICES is the
        TPU-native answer; the episode gather runs on device inside the
        jitted step."""
        from nwhead_tpu.data.pipeline import device_images

        if self.mesh is not None:
            return None
        dev = device_images(self.train_dataset)
        if dev is not None and not hasattr(self, "_train_step_idx"):
            self._train_step_idx = jax.jit(self._train_step_idx_impl)
        return dev

    def _train_step_idx_impl(self, params, batch_stats, opt_state, images,
                             qidx, qy, sidx, sy):
        return self._train_step_impl(
            params, batch_stats, opt_state, images[qidx], qy, images[sidx], sy
        )

    def train_epoch(self, num_steps: Optional[int] = None, prefetch: int = 2) -> None:
        """One training epoch. Host work (episodic sampling + image decode)
        runs in a background thread ``prefetch`` batches ahead of the device
        step — the reference pays this cost on the critical path every step
        (SURVEY.md §3.1). In-memory transform-free datasets take the
        device-resident fast path (see ``_device_dataset``)."""
        from nwhead_tpu.data.pipeline import EpisodicBatcher, prefetch_to_device

        batcher = EpisodicBatcher(
            self.train_dataset,
            self.net.support_train,
            self.batch_size,
            seed=int(self.rng.integers(0, 2**31 - 1)),
        )
        dev_images = self._device_dataset()

        step_losses, step_accs, step_sizes = [], [], []
        if dev_images is not None:
            # Indices-only stream: sampling stays on host, pixels never
            # cross the link.
            for qidx, qy, sidx, sy in (
                (np.asarray(b[0]), b[1].astype(np.int32),
                 np.asarray(b[2], np.int32), np.asarray(b[3], np.int32))
                for b in batcher.epoch_indices(num_steps)
            ):
                (
                    self.state.params,
                    self.state.batch_stats,
                    self.state.opt_state,
                    loss,
                    acc,
                ) = self._train_step_idx(
                    self.state.params,
                    self.state.batch_stats,
                    self.state.opt_state,
                    dev_images,
                    jnp.asarray(qidx, jnp.int32),
                    jnp.asarray(qy),
                    jnp.asarray(sidx),
                    jnp.asarray(sy),
                )
                self.state.step += 1
                step_losses.append(loss)
                step_accs.append(acc)
                step_sizes.append(len(qidx))
            self._finish_train_metrics(step_losses, step_accs, step_sizes)
            return

        def host_batches():
            for qimg, qy, simg, sy, _sm in batcher.epoch(num_steps):
                yield (
                    qimg.astype(np.float32),
                    qy.astype(np.int32),
                    simg.astype(np.float32),
                    np.asarray(sy).astype(np.int32),
                )

        for qimg, qy, simg, sy in prefetch_to_device(host_batches(), size=prefetch):
            if self.mesh is not None:
                qimg = jax.device_put(qimg, self._data_shard)
                qy = jax.device_put(qy, self._data_shard)
                simg = jax.device_put(simg, self._replicated)
                sy = jax.device_put(sy, self._replicated)
            bs = qimg.shape[0]
            (
                self.state.params,
                self.state.batch_stats,
                self.state.opt_state,
                loss,
                acc,
            ) = self._train_step(
                self.state.params,
                self.state.batch_stats,
                self.state.opt_state,
                qimg,
                qy,
                simg,
                sy,
            )
            self.state.step += 1
            # NO host readback here: float()-ing a per-step scalar costs a
            # full device round trip per step (~30 ms through the axon
            # tunnel — it made a 750-step epoch take 20+ minutes instead
            # of ~30 s). Accumulate device scalars; sync ONCE per epoch.
            step_losses.append(loss)
            step_accs.append(acc)
            step_sizes.append(bs)

        self._finish_train_metrics(step_losses, step_accs, step_sizes)

    def _finish_train_metrics(self, step_losses, step_accs, step_sizes):
        """ONE device sync per epoch (a per-step float() costs a ~30 ms
        tunnel round trip each)."""
        if step_losses:
            for l, a, b in zip(
                np.asarray(jnp.stack(step_losses)),
                np.asarray(jnp.stack(step_accs)),
                step_sizes,
            ):
                self.metrics["loss:train"].update_state(float(l), b)
                self.metrics["acc:train"].update_state(float(a) * 100, b)

    def eval_epoch(self, mode: str = "random", num_steps: Optional[int] = None,
                   prefetch: int = 2) -> float:
        """One eval pass in the given inference mode; returns accuracy.
        ECE is computed over the epoch's concatenated probabilities
        (``train.py:352-379``). Host gather/decode runs in a background
        thread ``prefetch`` batches ahead, like the train path."""
        from nwhead_tpu.data.pipeline import device_images, prefetch_to_device

        ds = self.val_dataset
        variables = self.state.variables()
        probs_all: List[np.ndarray] = []
        gts: List[np.ndarray] = []
        dev = device_images(ds) if self.mesh is None else None
        if dev is not None:
            # Device-resident val set: slice images on device, ship only
            # index ranges (see _device_dataset — the link is the wall).
            def dev_batches():
                n = len(ds)
                count = 0
                for start in range(0, n, self.batch_size):
                    if num_steps is not None and count >= num_steps:
                        break
                    idx = np.arange(start, min(start + self.batch_size, n))
                    pad = self.batch_size - len(idx)
                    idxp = (
                        np.concatenate([idx, np.zeros(pad, idx.dtype)])
                        if pad else idx
                    )
                    yield dev[jnp.asarray(idxp, jnp.int32)], np.asarray(
                        ds.targets[idx]
                    )
                    count += 1

            batches = dev_batches()
        else:
            batches = prefetch_to_device(
                _padded_eval_batches(ds, self.batch_size, num_steps),
                size=prefetch,
            )
        for img, label in batches:
            real = label.shape[0]
            output = self.net.predict(variables, img, mode)
            if isinstance(output, tuple):
                output = output[0]
            output = output[:real]
            loss = float(M.nll_loss(output, label))
            acc = float(M.acc(jnp.argmax(output, -1), label))
            self.val_metrics[f"loss:val:{mode}"].update_state(loss, real)
            self.val_metrics[f"acc:val:{mode}"].update_state(acc * 100, real)
            probs_all.append(np.asarray(jnp.exp(output)))
            gts.append(np.asarray(label))
        ece = float(M.ece(np.concatenate(probs_all), np.concatenate(gts))) * 100
        self.val_metrics[f"ece:val:{mode}"].update_state(ece, 1)
        return self.val_metrics[f"acc:val:{mode}"].result()

    def eval_all_modes(self, num_steps: Optional[int] = None) -> float:
        """precompute + eval in each mode; returns full-mode accuracy (the
        best-checkpoint key, ``train.py:289-297``)."""
        self.net.precompute(self.state.variables())
        acc_by_mode = {}
        for mode in self.eval_modes:
            acc_by_mode[mode] = self.eval_epoch(mode, num_steps)
        return acc_by_mode.get("full", next(iter(acc_by_mode.values())))

    def reset_metrics(self) -> None:
        for m in self.metrics.values():
            m.reset_state()
        for m in self.val_metrics.values():
            m.reset_state()


class FCTrainer:
    """Baseline FC-head trainer (``train.py:381-399`` step semantics)."""

    def __init__(
        self,
        model,  # FCNet module
        train_dataset,
        val_dataset,
        lr: float = 1e-3,
        batch_size: int = 32,
        milestones: Sequence[int] = (100, 150),
        gamma: float = 0.1,
        weight_decay: float = 1e-4,
        freeze_featurizer: bool = False,
        seed: int = 0,
    ) -> None:
        self.model = model
        self.train_dataset = train_dataset
        self.val_dataset = val_dataset
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.steps_per_epoch = max(1, len(train_dataset) // batch_size)

        sample = jnp.asarray(train_dataset.gather(np.arange(min(batch_size, len(train_dataset)))))
        variables = model.init(jax.random.PRNGKey(seed), sample, train=False)
        if getattr(model.featurizer, "pretrained_path", None):
            from nwhead_tpu.models.torch_import import merge_backbone_pretrained

            variables = merge_backbone_pretrained(variables, model.featurizer)
        mask = featurizer_freeze_mask(variables["params"]) if freeze_featurizer else None
        # Exposed for per-epoch LR logging (and the endurance runner's
        # schedule-continuity check): LR is a pure function of the global
        # step, so a resumed run's LR trajectory must coincide exactly.
        self.lr_schedule = multistep_lr(lr, milestones, gamma, self.steps_per_epoch)
        self.tx = make_optimizer(
            lr, milestones, gamma, self.steps_per_epoch, weight_decay,
            freeze_mask=mask,
        )
        self.state = TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=self.tx.init(variables["params"]),
        )
        self._train_step = jax.jit(self._train_step_impl)
        self._eval_step = jax.jit(
            lambda variables, img: self.model.apply(variables, img, train=False)
        )
        self.metrics = {k: M.Metric() for k in ("loss:train", "acc:train")}
        self.val_metrics = {k: M.Metric() for k in ("loss:val", "acc:val", "ece:val")}

    def _train_step_impl(self, params, batch_stats, opt_state, img, label):
        def loss_fn(p):
            log_probs, updates = self.model.apply(
                {"params": p, "batch_stats": batch_stats},
                img,
                train=True,
                mutable=["batch_stats"],
            )
            return M.nll_loss(log_probs, label), (log_probs, updates["batch_stats"])

        (loss, (log_probs, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, new_opt_state = self.tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        acc = M.acc(jnp.argmax(log_probs, -1), label)
        return new_params, new_stats, new_opt_state, loss, acc

    def train_epoch(self, num_steps: Optional[int] = None) -> None:
        ds = self.train_dataset
        n = len(ds)
        order = self.rng.permutation(n)
        stop = (n // self.batch_size) * self.batch_size
        count = 0
        step_losses, step_accs, step_sizes = [], [], []
        for start in range(0, stop, self.batch_size):
            if num_steps is not None and count >= num_steps:
                break
            idx = order[start : start + self.batch_size]
            img = jnp.asarray(ds.gather(idx))
            label = jnp.asarray(ds.targets[idx])
            (
                self.state.params,
                self.state.batch_stats,
                self.state.opt_state,
                loss,
                acc,
            ) = self._train_step(
                self.state.params, self.state.batch_stats, self.state.opt_state, img, label
            )
            self.state.step += 1
            # One device sync per EPOCH, not per step (a per-step float()
            # costs a ~30 ms tunnel round trip — see NWTrainer.train_epoch).
            step_losses.append(loss)
            step_accs.append(acc)
            step_sizes.append(len(idx))
            count += 1
        if step_losses:
            for l, a, b in zip(
                np.asarray(jnp.stack(step_losses)),
                np.asarray(jnp.stack(step_accs)),
                step_sizes,
            ):
                self.metrics["loss:train"].update_state(float(l), b)
                self.metrics["acc:train"].update_state(float(a) * 100, b)

    def eval_epoch(self, num_steps: Optional[int] = None, prefetch: int = 2) -> float:
        from nwhead_tpu.data.pipeline import prefetch_to_device

        ds = self.val_dataset
        variables = self.state.variables()
        probs_all, gts = [], []
        batches = _padded_eval_batches(ds, self.batch_size, num_steps)
        for img, label in prefetch_to_device(batches, size=prefetch):
            real = label.shape[0]
            output = self._eval_step(variables, img)[:real]
            self.val_metrics["loss:val"].update_state(
                float(M.nll_loss(output, label)), real
            )
            self.val_metrics["acc:val"].update_state(
                float(M.acc(jnp.argmax(output, -1), label)) * 100, real
            )
            probs_all.append(np.asarray(jnp.exp(output)))
            gts.append(np.asarray(label))
        ece = float(M.ece(np.concatenate(probs_all), np.concatenate(gts))) * 100
        self.val_metrics["ece:val"].update_state(ece, 1)
        return self.val_metrics["acc:val"].result()

    def reset_metrics(self) -> None:
        for m in self.metrics.values():
            m.reset_state()
        for m in self.val_metrics.values():
            m.reset_state()
