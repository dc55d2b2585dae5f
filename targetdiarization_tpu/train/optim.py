"""Optimizer / schedule factories (optax).

Equivalent capability to look2hear/system/optimizers.py:58 (a factory
over torch + torch_optimizer names) and schedulers.py:59,115 (the DPTNet
warmup schedule and a halving exponential decay), expressed as optax
transforms so they compose with the pjit DP trainer.
"""

from __future__ import annotations

import optax

_OPTIMIZERS = {
    "adam": optax.adam,
    "adamw": optax.adamw,
    "sgd": optax.sgd,
    "rmsprop": optax.rmsprop,
    "adagrad": optax.adagrad,
    "lamb": optax.lamb,
    "lars": optax.lars,
    "adabelief": optax.adabelief,
    "radam": optax.radam,
    "yogi": optax.yogi,
    "novograd": optax.novograd,
    "lion": optax.lion,
}


def make_optimizer(name: str = "adam", learning_rate=1e-3, weight_decay: float = 0.0,
                   grad_clip: float = 5.0, **kwargs) -> optax.GradientTransformation:
    """Factory by name with optional global-norm clipping (the reference
    clips at 5.0 in its Lightning config)."""
    name = name.lower()
    if name not in _OPTIMIZERS:
        raise ValueError(f"unknown optimizer {name!r}; known: {sorted(_OPTIMIZERS)}")
    kwargs = dict(kwargs)
    if weight_decay and name in ("adamw", "lamb", "lion"):
        kwargs["weight_decay"] = weight_decay
    opt = _OPTIMIZERS[name](learning_rate, **kwargs)
    if grad_clip and grad_clip > 0:
        return optax.chain(optax.clip_by_global_norm(grad_clip), opt)
    return opt


def dptnet_schedule(d_model: int, warmup_steps: int = 4000,
                    scale: float = 1.0) -> optax.Schedule:
    """DPTNet warmup: lr = scale · d_model^-0.5 · min(s^-0.5, s·w^-1.5)
    (reference schedulers.py:59)."""
    import jax.numpy as jnp

    def schedule(step):
        s = jnp.asarray(step, jnp.float32) + 1.0
        return scale * (d_model ** -0.5) * jnp.minimum(
            s ** -0.5, s * (warmup_steps ** -1.5))

    return schedule


def halving_exponential(base_lr: float, decay_every: int, factor: float = 0.5
                        ) -> optax.Schedule:
    """Step-halving exponential decay (reference schedulers.py:115)."""
    return optax.exponential_decay(
        init_value=base_lr, transition_steps=decay_every, decay_rate=factor,
        staircase=True)
