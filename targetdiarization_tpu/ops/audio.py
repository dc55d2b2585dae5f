"""Elementwise / broadcast audio DSP primitives (jnp, XLA-fused).

TPU-native counterpart of the scalar-numpy utility layer in the
reference's AudioProcessor (gain/normalize/mono/mix/dtype conversion,
reference AudioProcessor.py:350-548, :1035-1107). Everything here is a
pure jnp function safe to call under jit; XLA fuses these into
neighbouring kernels so none of them costs a separate HBM round-trip.
"""

from __future__ import annotations

import jax.numpy as jnp

# Downmix weights for common layouts (reference AudioProcessor.py:362-366:
# 5.1/7.1 → mono uses centre/front weighting per ITU-R BS.775).
_DOWNMIX = {
    1: [1.0],
    2: [0.5, 0.5],
    6: [0.2929, 0.2929, 0.2071, 0.0, 0.1036, 0.1036],  # L R C LFE Ls Rs
    8: [0.2412, 0.2412, 0.1705, 0.0, 0.0853, 0.0853, 0.0882, 0.0882],
}


def to_mono(audio: jnp.ndarray) -> jnp.ndarray:
    """Downmix (C, T) → (T,) with layout-aware weights; (T,) passes through."""
    if audio.ndim == 1:
        return audio
    nch = audio.shape[0]
    if nch in _DOWNMIX:
        w = jnp.asarray(_DOWNMIX[nch], dtype=audio.dtype)
    else:
        w = jnp.full((nch,), 1.0 / nch, dtype=audio.dtype)
    return jnp.einsum("c,ct->t", w, audio)


def db_to_gain(db) -> jnp.ndarray:
    return jnp.power(10.0, jnp.asarray(db) / 20.0)


def gain_to_db(gain, eps: float = 1e-12) -> jnp.ndarray:
    return 20.0 * jnp.log10(jnp.maximum(jnp.asarray(gain), eps))


def apply_gain_db(audio: jnp.ndarray, db) -> jnp.ndarray:
    return audio * db_to_gain(db)


def rms(audio: jnp.ndarray, axis=-1, keepdims: bool = False) -> jnp.ndarray:
    return jnp.sqrt(jnp.mean(jnp.square(audio), axis=axis, keepdims=keepdims))


def rms_db(audio: jnp.ndarray) -> jnp.ndarray:
    return gain_to_db(rms(audio))


def peak_normalize(audio: jnp.ndarray, peak_db: float = -1.0) -> jnp.ndarray:
    """Scale so the absolute peak sits at `peak_db` dBFS
    (reference AudioProcessor audio_normalize behavior)."""
    peak = jnp.max(jnp.abs(audio))
    target = db_to_gain(peak_db)
    return audio * (target / jnp.maximum(peak, 1e-12))


def mix_audio(a: jnp.ndarray, b: jnp.ndarray, snr_db: float | None = None) -> jnp.ndarray:
    """Mix two equal-length signals; if snr_db given, scale b to sit
    snr_db below a (reference AudioProcessor.mix_audio :809)."""
    if snr_db is None:
        return a + b
    scale = rms(a) / jnp.maximum(rms(b), 1e-12) * db_to_gain(-snr_db)
    return a + b * scale


def crossfade_concat(a: jnp.ndarray, b: jnp.ndarray, fade: int) -> jnp.ndarray:
    """Concatenate with a linear crossfade of `fade` samples."""
    if fade <= 0:
        return jnp.concatenate([a, b])
    ramp = jnp.linspace(0.0, 1.0, fade, dtype=a.dtype)
    mid = a[-fade:] * (1.0 - ramp) + b[:fade] * ramp
    return jnp.concatenate([a[:-fade], mid, b[fade:]])


def soft_clip(audio: jnp.ndarray, limit: float = 0.999) -> jnp.ndarray:
    """tanh-based soft clipper keeping |y| < limit."""
    return limit * jnp.tanh(audio / limit)


def fade_edges(audio: jnp.ndarray, fade: int) -> jnp.ndarray:
    """Apply linear fade-in/out of `fade` samples at both edges."""
    if fade <= 0:
        return audio
    n = audio.shape[-1]
    idx = jnp.arange(n, dtype=audio.dtype)
    env = jnp.minimum(1.0, jnp.minimum(idx / fade, (n - 1 - idx) / fade))
    return audio * env
