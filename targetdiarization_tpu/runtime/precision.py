"""Mixed-precision policy for inference engines.

On TPU v5e the MXU runs bf16 matmuls at ~2× the fp32(=3-pass-bf16)
rate and half the HBM traffic (RTT-amortized: the MossFormer2 grouped
attention measures 1.03 ms bf16 vs 1.77 ms fp32 at production shapes —
see ops/pallas/flash.py); every inference engine therefore computes in
bf16 by default on TPU and fp32 elsewhere. Params are cast once at
engine construction; inputs are cast at the jit boundary and outputs
cast back to fp32, so callers never see bf16.

Override with TD_COMPUTE_DTYPE=float32|bfloat16 or per-engine
`compute_dtype=` kwargs.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def resolve_compute_dtype(requested: str | None = None):
    """bf16 on TPU, fp32 elsewhere, unless overridden."""
    name = requested or os.environ.get("TD_COMPUTE_DTYPE")
    if name:
        return {"float32": jnp.float32, "f32": jnp.float32,
                "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16}[name.lower()]
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


def cast_params(params, dtype):
    """Cast floating leaves; ints (e.g. embeddings indices) untouched.

    Runs as ONE jitted program: a single device dispatch for the whole
    tree instead of one eager `astype` per leaf — hundreds of leaves ×
    ~28 ms tunnel RTT dominated engine construction time."""
    def _c(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.jit(lambda p: jax.tree_util.tree_map(_c, p))(params)


def cast_inputs(dtype, *arrays):
    out = []
    for a in arrays:
        if hasattr(a, "dtype") and jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating):
            out.append(jnp.asarray(a, dtype))
        else:
            out.append(jnp.asarray(a))
    return out


def quantize_i16(x) -> "np.ndarray":
    """Host-side: f32 audio in [-1, 1] → int16 for upload (half the
    bytes of f32 through the host↔device link). Integer input passes
    through untouched."""
    import numpy as np

    x = np.asarray(x)
    if x.dtype.kind == "i":
        return x.astype(np.int16)
    return np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int16)


def dequantize_audio(audio):
    """In-graph: int16 audio → f32 in [-1, 1]; float passes through."""
    if audio.dtype == jnp.int16:
        return audio.astype(jnp.float32) / 32768.0
    return audio


def f32(tree):
    """Cast all floating leaves of outputs back to fp32."""
    def _c(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(jnp.float32)
        return x

    return jax.tree_util.tree_map(_c, tree)
