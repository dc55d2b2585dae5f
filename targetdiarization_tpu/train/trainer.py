"""Data-parallel separation trainer (pjit over a device mesh).

The TPU-native replacement for the reference's Lightning module
(look2hear/system/audio_litmodule.py:36-191): train/val steps with PIT
SI-SDR loss, cross-replica metric reduction (XLA all-reduce from the
replicated output sharding, replacing Lightning's `self.all_gather`),
checkpoint save/RESUME (which the reference delegates to Lightning —
SURVEY.md §5.4), and gradient clipping.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..parallel.mesh import make_mesh, shard_batch, replicated, batch_sharding
from ..runtime.params import save_checkpoint
from .losses import pit_si_sdr_loss
from .optim import make_optimizer


@dataclass
class TrainConfig:
    optimizer: str = "adam"
    learning_rate: float = 1e-3
    weight_decay: float = 0.0
    grad_clip: float = 5.0
    n_devices: int | None = None  # None = all
    checkpoint_dir: str = "checkpoints/separation"
    save_every: int = 1000
    loss: str = "pit_si_sdr"  # or "mixit"
    extra: dict = field(default_factory=dict)


class SeparationTrainer:
    """model: a flax separator with (B, T) → (B, S, T) apply."""

    def __init__(self, model, params=None, cfg: TrainConfig | None = None,
                 seed: int = 0, example_seconds: float = 1.0):
        self.model = model
        self.cfg = cfg or TrainConfig()
        self.mesh = make_mesh(self.cfg.n_devices)
        self.step = 0
        if params is None:
            t = int(example_seconds * getattr(model, "sample_rate", 16000))
            params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, t)))
        self.opt = make_optimizer(
            self.cfg.optimizer, self.cfg.learning_rate,
            self.cfg.weight_decay, self.cfg.grad_clip)
        self.state = {"params": params, "opt": self.opt.init(params)}

        def train_step(state, batch):
            def loss_fn(p):
                est = self.model.apply(p, batch["mix"], deterministic=True)
                if self.cfg.loss == "mixit":
                    from .losses import mixit_loss

                    return mixit_loss(est, batch["src"])
                return pit_si_sdr_loss(est, batch["src"])

            loss, grads = jax.value_and_grad(loss_fn)(state["params"])
            updates, new_opt = self.opt.update(
                grads, state["opt"], state["params"])
            new_params = optax.apply_updates(state["params"], updates)
            gnorm = optax.global_norm(grads)
            return {"params": new_params, "opt": new_opt}, {
                "loss": loss, "grad_norm": gnorm}

        def eval_step(state, batch):
            est = self.model.apply(state["params"], batch["mix"],
                                   deterministic=True)
            return {"loss": pit_si_sdr_loss(est, batch["src"])}

        rep = replicated(self.mesh)
        shard = batch_sharding(self.mesh)
        self._train_step = jax.jit(
            train_step, in_shardings=(rep, shard), out_shardings=(rep, rep))
        self._eval_step = jax.jit(
            eval_step, in_shardings=(rep, shard), out_shardings=rep)

    # ---------------- loops ----------------

    @property
    def n_devices(self) -> int:
        return int(self.mesh.devices.size)

    def _place(self, batch: dict):
        b = next(iter(batch.values())).shape[0]
        if b % self.n_devices:
            raise ValueError(
                f"batch size {b} not divisible by mesh size {self.n_devices}")
        return shard_batch(self.mesh, {k: jnp.asarray(v) for k, v in batch.items()})

    def fit(self, batches, steps: int | None = None, log_every: int = 10,
            log_fn=print) -> list:
        history = []
        for i, batch in enumerate(batches):
            if steps is not None and i >= steps:
                break
            self.state, metrics = self._train_step(self.state, self._place(batch))
            self.step += 1
            if self.step % log_every == 0:
                entry = {"step": self.step,
                         **{k: float(v) for k, v in metrics.items()}}
                history.append(entry)
                log_fn(f"step {entry['step']}: loss={entry['loss']:.3f} "
                       f"grad_norm={entry['grad_norm']:.3f}")
            if self.cfg.save_every and self.step % self.cfg.save_every == 0:
                self.save()
        return history

    def evaluate(self, batches) -> float:
        losses = [
            float(self._eval_step(self.state, self._place(b))["loss"])
            for b in batches
        ]
        return float(np.mean(losses)) if losses else float("nan")

    # ---------------- checkpoint / resume ----------------

    def save(self, path: str | None = None) -> str:
        import json

        from ..runtime.params import save_pytree

        path = path or self.cfg.checkpoint_dir
        os.makedirs(path, exist_ok=True)
        save_pytree(path, self.state)  # params + optax state, any pytree
        with open(os.path.join(path, "trainer.json"), "w") as f:
            json.dump({
                "step": self.step,
                "model_name": type(self.model).__name__,
                "model_args": self._model_args(),
            }, f)
        return path

    def restore(self, path: str | None = None) -> int:
        import json

        from ..runtime.params import restore_pytree

        path = path or self.cfg.checkpoint_dir
        self.state = restore_pytree(path, self.state)
        with open(os.path.join(path, "trainer.json")) as f:
            self.step = json.load(f)["step"]
        return self.step

    def _model_args(self) -> dict:
        return {
            k: getattr(self.model, k)
            for k in getattr(self.model, "__dataclass_fields__", {})
            if isinstance(getattr(self.model, k), (int, float, str, bool))
        }

    def export_inference_checkpoint(self, path: str):
        """Save params-only checkpoint loadable by the engines'
        from_pretrained (runtime.registry dispatch)."""
        save_checkpoint(
            path, self.state["params"],
            model_name=type(self.model).__name__,
            model_args=self._model_args(),
        )
        return path
