"""Shared acoustic front-end: fbank + LFR + CMVN.

Every FunASR-family model the reference loads (FSMN-VAD, Paraformer,
CAM++, ERes2NetV2 — SURVEY.md §2.5) consumes 80-dim Kaldi-style fbank
at 16 kHz, optionally low-frame-rate stacked and CMVN-normalized. The
reference gets this from funasr's torch front-end; here it is one jitted
jnp pipeline on top of ops.mel.log_mel_spectrogram.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.mel import log_mel_spectrogram

FRAME_HOP_S = 0.01  # 10 ms fbank hop everywhere
FRAME_LEN_S = 0.025


def num_frames(n_samples: int, sr: int = 16000) -> int:
    """Frames produced by snip-edges framing (matches frame_signal)."""
    frame, hop = int(FRAME_LEN_S * sr), int(FRAME_HOP_S * sr)
    return 0 if n_samples < frame else 1 + (n_samples - frame) // hop


@partial(jax.jit, static_argnames=("sr", "n_mels"))
def fbank(audio: jnp.ndarray, sr: int = 16000, n_mels: int = 80) -> jnp.ndarray:
    """(..., T) float32 in [-1, 1] → (..., frames, n_mels) log-mel.

    Kaldi operates on int16-range samples; scale up so log energies
    match the FunASR front-end convention.
    """
    return log_mel_spectrogram(
        audio * 32768.0,
        sr=sr,
        n_mels=n_mels,
        frame_length=int(FRAME_LEN_S * sr),
        hop=int(FRAME_HOP_S * sr),
    )


def lfr(x: jnp.ndarray, m: int = 7, n: int = 6) -> jnp.ndarray:
    """Low frame rate: stack m consecutive frames, advance by n.

    (..., T, D) → (..., ceil(T/n), m*D); the first frame is left-padded
    by repeating frame 0 (m//2 times) and the tail is right-padded by
    repeating the last frame, the FunASR LFR convention.
    """
    T, D = x.shape[-2], x.shape[-1]
    left = (m - 1) // 2
    t_out = -(-T // n)
    # pad with edge replication so every window is full
    pad_right = (t_out - 1) * n + m - left - T
    pad = [(0, 0)] * (x.ndim - 2) + [(left, max(pad_right, 0)), (0, 0)]
    xp = jnp.pad(x, pad, mode="edge")
    idx = jnp.arange(m)[None, :] + n * jnp.arange(t_out)[:, None]
    stacked = xp[..., idx, :]  # (..., t_out, m, D)
    return stacked.reshape(*x.shape[:-2], t_out, m * D)


def apply_cmvn(x: jnp.ndarray, mean: jnp.ndarray, istd: jnp.ndarray) -> jnp.ndarray:
    """Global cepstral mean/variance normalization: (x + mean) * istd
    (FunASR stores negative means and inverse stddevs)."""
    return (x + mean) * istd


def default_cmvn(dim: int) -> tuple[np.ndarray, np.ndarray]:
    """Identity CMVN for models without trained statistics."""
    return np.zeros(dim, np.float32), np.ones(dim, np.float32)
