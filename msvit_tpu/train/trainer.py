"""Generic training driver tying together the jitted step, checkpointing,
and metrics — the production replacement for the reference's ad-hoc
sandbox loops (print every N iterations, hard-coded stop, no persistence;
`sandbox/predictive.py:96-137`)."""

from __future__ import annotations

from typing import Any, Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from msvit_tpu.train.checkpoint import CheckpointManager
from msvit_tpu.train.loop import train_step_fn
from msvit_tpu.utils.metrics import MetricsLogger


class Trainer:
    """loss_fn(params, batch, rng) -> (scalar, aux dict of scalars)."""

    def __init__(
        self,
        loss_fn: Callable[[Any, Any, jax.Array], Tuple[jnp.ndarray, Any]],
        optimizer: optax.GradientTransformation,
        params: Any,
        checkpoint_dir: Optional[str] = None,
        save_every: int = 1000,
        metrics_path: Optional[str] = None,
        log_every: int = 25,
        donate: bool = True,
        num_microbatches: int = 1,
        monitor: bool = False,
        max_nonfinite: int = 10,
        ema_decay: Optional[float] = None,
    ):
        if monitor:
            # production guard, all on device (no per-step host sync):
            # non-finite-gradient steps are skipped (params/opt state
            # untouched) and the run errors out after `max_nonfinite`
            # consecutive bad steps; grad_norm/grads_finite ride the aux
            # dict and surface in the JSONL metrics at log boundaries.
            optimizer = optax.apply_if_finite(optimizer, max_nonfinite)
        self.step_fn = train_step_fn(
            loss_fn, optimizer, donate=donate,
            num_microbatches=num_microbatches, monitor=monitor,
            ema_decay=ema_decay,
        )
        self.params = params
        self.opt_state = optimizer.init(params)
        # EMA serving weights (ema_decay): tracked inside the jitted step
        # (zero extra dispatch), checkpointed/restored alongside params
        self.ema_decay = ema_decay
        # real copies: params are donated into the step, the EMA tree is
        # donated separately — they must not alias
        self.ema_params = (
            jax.tree.map(lambda x: jnp.array(x), params)
            if ema_decay
            else None
        )
        self.step = 0
        self.log_every = log_every
        self.ckpt = (
            CheckpointManager(checkpoint_dir, save_every=save_every)
            if checkpoint_dir
            else None
        )
        self.metrics = MetricsLogger(metrics_path) if metrics_path else None

    def restore(self, data_iter: Any = None) -> int:
        """Resume from the latest checkpoint, if any.  Returns the step.

        Pass the training iterator as `data_iter` when it is stateful
        (`state_dict`/`load_state_dict`, e.g.
        `data.resumable.ResumableLoader`): its position is restored too,
        so the resumed run consumes exactly the batches the interrupted
        run would have (deterministic mid-epoch resume)."""
        if self.ckpt is None:
            return 0
        stateful = data_iter is not None and hasattr(data_iter, "state_dict")
        state = {"params": self.params, "opt_state": self.opt_state,
                 "step": jnp.asarray(0)}
        if stateful:
            state["data"] = data_iter.state_dict()
        if self.ema_params is not None:
            state["ema"] = self.ema_params
        step, state = self.ckpt.restore_latest(state)
        if step:
            self.params = state["params"]
            self.opt_state = state["opt_state"]
            self.step = int(state["step"])
            if stateful:
                data_iter.load_state_dict(
                    {k: int(v) for k, v in state["data"].items()}
                )
            if self.ema_params is not None:
                self.ema_params = state["ema"]
        return self.step

    def fit(
        self,
        batches: Iterable[Any],
        num_steps: int,
        rng: jax.Array,
    ) -> float:
        """Run `num_steps` updates; returns the final loss.

        The per-step rng is `fold_in(rng, step)` (not a running split),
        so a resumed run replays the interrupted run's keys exactly."""
        loss = float("nan")
        for batch in batches:
            if self.step >= num_steps:
                break
            key = jax.random.fold_in(rng, self.step)
            if self.ema_params is not None:
                (
                    self.params,
                    self.opt_state,
                    loss_dev,
                    aux,
                    self.ema_params,
                ) = self.step_fn(
                    self.params, self.opt_state, batch, key, self.ema_params
                )
            else:
                self.params, self.opt_state, loss_dev, aux = self.step_fn(
                    self.params, self.opt_state, batch, key
                )
            self.step += 1
            if self.step % self.log_every == 0 or self.step == num_steps:
                loss = float(loss_dev)
                if self.metrics:
                    scalars = {
                        k: float(v)
                        for k, v in (aux or {}).items()
                        if jnp.ndim(v) == 0 and k != "loss"  # logged already
                    }
                    self.metrics.log(self.step, loss=loss, **scalars)
            if self.ckpt:
                snapshot = {
                    "params": self.params,
                    "opt_state": self.opt_state,
                    "step": jnp.asarray(self.step),
                }
                if hasattr(batches, "state_dict"):
                    snapshot["data"] = batches.state_dict()
                if self.ema_params is not None:
                    snapshot["ema"] = self.ema_params
                self.ckpt.maybe_save(self.step, snapshot)
        if self.ckpt:
            self.ckpt.close()
        if self.metrics:
            self.metrics.close()
        return loss
