"""Mel filterbank + log-mel features (jnp).

Feeds the ASR/VAD/speaker front-ends (the reference delegates this to
funasr/librosa/torchaudio; e.g. dnsmos.py:28). The filterbank matrix is
built once on host and applied as a single matmul — MXU-friendly.

`log_mel_spectrogram` follows the Kaldi-style fbank convention used by
FunASR models (HTK mel scale, povey/hann window options, snip_edges),
since FSMN-VAD / Paraformer / CAM++ / ERes2NetV2 all consume
80-dim fbank features at 16 kHz.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


def _hz_to_mel(f, htk: bool = True):
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # Slaney
    f_min, f_sp = 0.0, 200.0 / 3
    mel = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(f / min_log_hz) / logstep, mel)


def _mel_to_hz(m, htk: bool = True):
    m = np.asarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@lru_cache(maxsize=16)
def _mel_matrix(
    sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float, htk: bool
) -> np.ndarray:
    n_freq = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_freq)
    mel_pts = np.linspace(_hz_to_mel(fmin, htk), _hz_to_mel(fmax, htk), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts, htk)
    lower, center, upper = hz_pts[:-2], hz_pts[1:-1], hz_pts[2:]
    up = (fft_freqs[None, :] - lower[:, None]) / np.maximum(center - lower, 1e-8)[:, None]
    down = (upper[:, None] - fft_freqs[None, :]) / np.maximum(upper - center, 1e-8)[:, None]
    fb = np.maximum(0.0, np.minimum(up, down))
    return fb.astype(np.float32)


def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: float | None = None,
    htk: bool = True,
) -> jnp.ndarray:
    """(n_mels, n_fft//2+1) triangular filterbank matrix."""
    return jnp.asarray(_mel_matrix(sr, n_fft, n_mels, fmin, fmax or sr / 2.0, htk))


def _povey_window(n: int) -> np.ndarray:
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / (n - 1))) ** 0.85


@partial(
    jax.jit,
    static_argnames=("sr", "n_mels", "frame_length", "hop", "preemph", "dither"),
)
def log_mel_spectrogram(
    audio: jnp.ndarray,
    sr: int = 16000,
    n_mels: int = 80,
    frame_length: int = 400,  # 25 ms @ 16 kHz
    hop: int = 160,  # 10 ms @ 16 kHz
    preemph: float = 0.97,
    dither: float = 0.0,
) -> jnp.ndarray:
    """Kaldi-style log-mel fbank of (..., T) → (..., n_frames, n_mels).

    snip_edges=True framing, povey window, per-frame mean removal,
    HTK mel, log of floored energies — the FunASR front-end contract.
    Input is expected in int16-range float (×32768) like Kaldi.
    """
    from .stft import frame_signal

    n_fft = 1 << (frame_length - 1).bit_length()  # next pow2 (512 for 400)
    frames = frame_signal(audio, frame_length, hop)
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)  # remove DC
    # pre-emphasis within frame (Kaldi convention: first sample vs itself)
    pre = frames - preemph * jnp.concatenate(
        [frames[..., :1], frames[..., :-1]], axis=-1
    )
    win = jnp.asarray(_povey_window(frame_length), dtype=frames.dtype)
    spec = jnp.fft.rfft(pre * win, n=n_fft, axis=-1)
    power = jnp.square(spec.real) + jnp.square(spec.imag)
    fb = mel_filterbank(sr, n_fft, n_mels, fmin=20.0)
    mel = jnp.einsum("...tf,mf->...tm", power, fb)
    return jnp.log(jnp.maximum(mel, 1.1920928955078125e-07))
