"""Mesh / sharding helpers: the framework's entire distributed story.

The reference has no explicit distributed communication (SURVEY.md §2.4);
its scaling envelope is single-GPU inference plus Lightning-DDP training.
The TPU-native equivalent built here:

- inference: pure data parallelism — independent requests/segments are
  sharded over a 1-D `data` mesh axis with `jax.sharding`; XLA inserts no
  collectives (embarrassingly parallel), traffic rides ICI only for the
  final gather.
- training: DP with gradient all-reduce (`psum` inserted by XLA from the
  sharding annotations) — the replacement for Lightning's NCCL all-reduce
  (look2hear/system/audio_litmodule.py:79,108,143).

All helpers degrade gracefully to a single device.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """1-D device mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the mesh axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a pytree of batched arrays with leading-dim sharding.

    Leading dims must be divisible by the mesh size; callers pad with the
    bucket machinery (runtime/buckets.py) before sharding.
    """
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def data_parallel_step(step_fn, mesh: Mesh, axis: str = "data", donate_state: bool = True):
    """Wrap a (state, batch) -> (state, metrics) step for DP execution.

    Params/opt state are replicated, the batch is sharded on its leading
    dim; XLA turns the gradient reduction implied by the replicated
    output sharding into an all-reduce over ICI.
    """
    rep = replicated(mesh)
    shard = batch_sharding(mesh, axis)

    jitted = jax.jit(
        step_fn,
        in_shardings=(rep, shard),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate_state else (),
    )

    def run(state, batch):
        return jitted(state, batch)

    return run


def pjit_forward(fn, mesh: Mesh, axis: str = "data"):
    """Jit a (params, batch)->out forward with replicated params and a
    batch-sharded input/output — the inference throughput-scaling path."""
    rep = replicated(mesh)
    shard = batch_sharding(mesh, axis)
    return jax.jit(fn, in_shardings=(rep, shard), out_shardings=shard)
