"""Polyphase resampling as an XLA dilated convolution.

TPU-native replacement for the reference's librosa/scipy resampling
(reference AudioProcessor.py:549-569). The rational-rate polyphase
resampler is expressed as `lax.conv_general_dilated` with
lhs_dilation=up and window_strides=down, which XLA lowers onto the MXU
as a strided filter bank — no scalar loops, fixed shapes per
(up, down, length) so each rate pair compiles exactly once.

Semantics match scipy.signal.resample_poly(x, up, down) with a
Kaiser-windowed lowpass designed on host (cached per rate pair).
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def _design_filter(up: int, down: int) -> np.ndarray:
    """Kaiser lowpass identical to scipy.signal.resample_poly's default."""
    from scipy.signal import firwin

    max_rate = max(up, down)
    f_c = 1.0 / max_rate  # cutoff in Nyquist units
    half_len = 10 * max_rate  # reasonable cutoff for sinc
    h = firwin(2 * half_len + 1, f_c, window=("kaiser", 5.0))
    return (h * up).astype(np.float32)


def _rates(target_sr: int, source_sr: int) -> tuple[int, int]:
    g = math.gcd(int(target_sr), int(source_sr))
    return int(target_sr) // g, int(source_sr) // g


@partial(jax.jit, static_argnames=("up", "down"))
def _resample_poly_jax(x: jnp.ndarray, up: int, down: int) -> jnp.ndarray:
    """resample_poly core: zero-stuff by `up`, filter, take every `down`."""
    h_np = _design_filter(up, down)
    n_in = x.shape[-1]
    n_out = -(-n_in * up // down)  # ceil
    half = (len(h_np) - 1) // 2
    # Padding chosen so output sample k equals the centered full convolution
    # of the zero-stuffed signal with h evaluated at half + k*down, exactly
    # matching scipy.signal.resample_poly / upfirdn trimming.
    pad_left = half
    pad_right = max(0, (n_out - 1) * down + half - (n_in - 1) * up)
    lhs = x.reshape(1, 1, n_in).astype(jnp.float32)
    rhs = jnp.asarray(h_np[::-1].copy()).reshape(1, 1, -1)
    y = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(down,),
        padding=[(pad_left, pad_right)],
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return y[0, 0, :n_out]


def resample(audio: jnp.ndarray, target_sr: int, source_sr: int) -> jnp.ndarray:
    """Resample 1-D or (C, T) audio between sample rates on device."""
    if target_sr == source_sr:
        return jnp.asarray(audio)
    up, down = _rates(target_sr, source_sr)
    x = jnp.asarray(audio)
    if x.ndim == 1:
        return _resample_poly_jax(x, up, down)
    return jax.vmap(lambda c: _resample_poly_jax(c, up, down))(x)


def resample_poly_np(audio: np.ndarray, target_sr: int, source_sr: int) -> np.ndarray:
    """Host-side scipy fallback (used by codec I/O before device upload)."""
    if target_sr == source_sr:
        return np.asarray(audio)
    from scipy.signal import resample_poly

    up, down = _rates(target_sr, source_sr)
    return resample_poly(np.asarray(audio), up, down, axis=-1).astype(np.float32)
