"""Framed STFT / iSTFT with hann windows and overlap-add (jnp, XLA).

TPU-native replacement for torch.stft/istft and the kernelized STFT in
the reference (AudioProcessor.py:82-120, look2hear/layers/stft.py:711,
apollo.py:250-297). Framing is a strided gather that XLA turns into a
single reshape-friendly copy; the DFT uses XLA's native FFT. All shapes
are static functions of (length, n_fft, hop), so each configuration
compiles once.

Conventions (torch.stft-compatible, center=True, reflect pad):
    stft(x)  -> complex (n_freq, n_frames), n_freq = n_fft//2 + 1
    istft(S) -> real (length,)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic hann window (matches torch.hann_window default)."""
    return jnp.asarray(0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n), dtype=dtype)


def frame_signal(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """Slice (..., T) into overlapping frames (..., n_frames, frame_length).

    Built from r = ceil(frame_length/hop) static slices of a (T//hop, hop)
    strided reshape — no gather (a (n_frames × frame_length) index gather
    lowers to a slow scatter/gather loop on TPU; the slice form is a pure
    copy that XLA fuses)."""
    n = x.shape[-1]
    if n < frame_length:
        return jnp.zeros((*x.shape[:-1], 0, frame_length), x.dtype)
    n_frames = 1 + (n - frame_length) // hop
    r = -(-frame_length // hop)  # hop-blocks per frame
    need = max((n_frames - 1 + r) * hop, -(-n // hop) * hop)
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, need - n)])
    xr = xp.reshape(*x.shape[:-1], -1, hop)  # (..., n_blocks, hop)
    parts = [xr[..., j : j + n_frames, :] for j in range(r)]
    frames = jnp.concatenate(parts, axis=-1)  # (..., n_frames, r*hop)
    return frames[..., :frame_length]


def overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """Inverse of frame_signal: (..., n_frames, frame_length) → (..., T).

    r = ceil(frame_length/hop) static slice-adds on a hop-blocked
    accumulator (duplicate-index scatter-add is pathologically slow on
    TPU; slice-adds lower to dynamic-update-slice)."""
    n_frames, frame_length = frames.shape[-2], frames.shape[-1]
    out_len = (n_frames - 1) * hop + frame_length
    r = -(-frame_length // hop)
    pad_f = r * hop - frame_length
    fr = jnp.pad(frames, [(0, 0)] * (frames.ndim - 1) + [(0, pad_f)])
    fr = fr.reshape(*frames.shape[:-1], r, hop)  # (..., n_frames, r, hop)
    batch = frames.shape[:-2]
    acc = jnp.zeros((*batch, n_frames + r - 1, hop), frames.dtype)
    for j in range(r):
        acc = acc.at[..., j : j + n_frames, :].add(fr[..., :, j, :])
    return acc.reshape(*batch, -1)[..., :out_len]


@partial(jax.jit, static_argnames=("n_fft", "hop", "win_length", "center"))
def stft(
    x: jnp.ndarray,
    n_fft: int,
    hop: int,
    win_length: int | None = None,
    window: jnp.ndarray | None = None,
    center: bool = True,
) -> jnp.ndarray:
    """STFT of (..., T) → complex (..., n_freq, n_frames)."""
    win_length = win_length or n_fft
    if window is None:
        window = hann_window(win_length)
    if win_length < n_fft:  # center-pad window to n_fft like torch
        lp = (n_fft - win_length) // 2
        window = jnp.pad(window, (lp, n_fft - win_length - lp))
    if center:
        pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        x = jnp.pad(x, pad, mode="reflect")
    frames = frame_signal(x, n_fft, hop) * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    return jnp.swapaxes(spec, -1, -2)


@partial(jax.jit, static_argnames=("n_fft", "hop", "win_length", "center", "length"))
def istft(
    spec: jnp.ndarray,
    n_fft: int,
    hop: int,
    win_length: int | None = None,
    window: jnp.ndarray | None = None,
    center: bool = True,
    length: int | None = None,
) -> jnp.ndarray:
    """iSTFT of complex (..., n_freq, n_frames) → real (..., T).

    Uses the standard windowed overlap-add with window-square
    normalization (identical to torch.istft)."""
    win_length = win_length or n_fft
    if window is None:
        window = hann_window(win_length)
    if win_length < n_fft:
        lp = (n_fft - win_length) // 2
        window = jnp.pad(window, (lp, n_fft - win_length - lp))
    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)
    frames = frames * window
    y = overlap_add(frames, hop)
    n_frames = spec.shape[-1]
    wsq = overlap_add(
        jnp.broadcast_to(window * window, (n_frames, n_fft)), hop
    )
    y = y / jnp.maximum(wsq, 1e-11)
    if center:
        y = y[..., n_fft // 2 :]
        if length is not None:
            y = y[..., :length]
        else:
            y = y[..., : y.shape[-1] - n_fft // 2]
    elif length is not None:
        y = y[..., :length]
    return y
