"""Device-side (in-graph) synthesis of the bootstrap language.

Round-2's `bootstrap_asr` fed training from a finite pre-rendered
`UnitPool` because host synthesis cost ~1.1 s/step — and the finite pool
put a memorization wall at ~10k steps (held-out CER regressed 0.063 →
0.10 on longer runs; see recipes.py experiment record). The language is
additive formant synthesis — a sum of sinusoids — so the TPU-first
answer is to render it *inside the train step* with `jax.random`:
infinite fresh data, one fused XLA program per step, no host bound.

Matches `train/synth.py::synth_char` distributionally (same formant
grid, duration classes, f0/phase/gain jitter, fricative band noise,
attack/decay envelope, inter-char gaps); not bit-exact (different RNG
stream). Held-out evaluation stays on the HOST renderer
(`synth_utterance`), so the eval remains an independent check that the
model learned the language, not the renderer.

Reference context: the slot this trains is the Paraformer ASR engine
(reference ASRProcessor.py:210-252); the synthetic language exists
because no external checkpoints are available in this environment.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .synth import BOOT_CHARS, SR, _char_params

# static per-char acoustic identity tables (host-computed once)
_P = [_char_params(i) for i in range(len(BOOT_CHARS))]
CHAR_F1 = np.array([p["f1"] for p in _P], np.float32)
CHAR_F2 = np.array([p["f2"] for p in _P], np.float32)
CHAR_DUR = np.array([p["dur"] for p in _P], np.float32)
CHAR_FRIC = np.array([p["fricative"] for p in _P], np.float32)

BW = 130.0
K_MAX = 42  # max harmonics: int(4000 / 95)
J_NOISE = 128  # sinusoid components approximating the fricative band noise
U_MAX = 4608  # max unit samples: 0.26 s * 1.1 jitter * 16 kHz, padded


def render_batch(key, char_ids, n_chars, n_samples: int):
    """Render a batch of utterances entirely in-graph.

    Args:
      key: PRNG key.
      char_ids: (B, C) int32 indices into BOOT_CHARS.
      n_chars: (B,) int32 valid char counts.
      n_samples: static output length (samples @ 16 kHz).

    Returns dict:
      audio: (B, n_samples) float32
      starts, ends: (B, C) float32 char boundaries in seconds
      n_valid: (B,) int32 valid sample counts
    """
    b, c = char_ids.shape
    k_f0, k_ph, k_dur, k_gain, k_gap, k_lead, k_na, k_nph, k_tail = \
        jax.random.split(key, 9)

    f1 = jnp.asarray(CHAR_F1)[char_ids]
    f2 = jnp.asarray(CHAR_F2)[char_ids]
    dur_b = jnp.asarray(CHAR_DUR)[char_ids]
    fric = jnp.asarray(CHAR_FRIC)[char_ids]

    dur = dur_b * jax.random.uniform(k_dur, (b, c), minval=0.9, maxval=1.1)
    n_u = jnp.floor(dur * SR)  # unit length in samples (B, C)
    f0 = jax.random.uniform(k_f0, (b, c), minval=95.0, maxval=220.0)
    t_u = jnp.arange(U_MAX, dtype=jnp.float32) / SR  # (U,)

    # ---- voiced: sum of harmonics (scan over k) ----
    kmax_c = jnp.floor(4000.0 / f0)  # (B, C)
    phases = jax.random.uniform(k_ph, (K_MAX, b, c), maxval=2 * np.pi)

    def harm(carry, k1_phase):
        k1, phase = k1_phase
        fk = k1 * f0  # (B, C)
        amp = (jnp.exp(-(((fk - f1) / BW) ** 2))
               + 0.7 * jnp.exp(-(((fk - f2) / BW) ** 2))
               + 0.02 / k1) * (k1 <= kmax_c)
        w = amp[..., None] * jnp.sin(
            2 * np.pi * fk[..., None] * t_u + phase[..., None])
        return carry + w, None

    ks = jnp.arange(1, K_MAX + 1, dtype=jnp.float32)
    voiced, _ = jax.lax.scan(
        harm, jnp.zeros((b, c, U_MAX), jnp.float32), (ks, phases))

    # ---- fricative: band noise as J random-phase sinusoids on a grid
    # spanning the two formant bands (host: FFT-filtered white noise with
    # Gaussian shape of width 2*BW — Rayleigh magnitudes, uniform phase) ----
    j = jnp.arange(J_NOISE, dtype=jnp.float32) / (J_NOISE - 1)
    lo, hi = f1 - 4 * BW, f2 + 4 * BW  # (B, C)
    fj = lo[..., None] + (hi - lo)[..., None] * j  # (B, C, J)
    shape = (jnp.exp(-(((fj - f1[..., None]) / (2 * BW)) ** 2))
             + 0.8 * jnp.exp(-(((fj - f2[..., None]) / (2 * BW)) ** 2)))
    # Rayleigh magnitudes via sqrt(-2·log1p(-u)): jax.random.rayleigh
    # computes log(u) with u ∈ [0,1), so u = 0 (p ≈ 1.2e-7/draw, and we
    # draw b·c·J ≈ 41k per step → ~0.5% of steps) yields inf → NaN audio
    # — the round-3 25k-step run died at step 744 from exactly this.
    # 1-u ∈ (0,1] never hits log(0).
    u_na = jax.random.uniform(k_na, (b, c, J_NOISE))
    mag = shape * jnp.sqrt(-2.0 * jnp.log1p(-u_na))
    nph = jax.random.uniform(k_nph, (b, c, J_NOISE), maxval=2 * np.pi)

    def ncomp(carry, idx):
        w = mag[:, :, idx, None] * jnp.sin(
            2 * np.pi * fj[:, :, idx, None] * t_u + nph[:, :, idx, None])
        return carry + w, None

    fricw, _ = jax.lax.scan(
        ncomp, jnp.zeros((b, c, U_MAX), jnp.float32), jnp.arange(J_NOISE))

    unit = jnp.where(fric[..., None] > 0, fricw, voiced)  # (B, C, U)

    # ---- envelope, validity mask, peak normalization ----
    att = 0.02
    in_unit = t_u[None, None, :] < dur[..., None]
    env = jnp.clip(t_u[None, None, :] / att, 0.0, 1.0) * \
        jnp.clip((dur[..., None] - t_u[None, None, :]) / att, 0.0, 1.0)
    unit = unit * env * in_unit
    peak = jnp.max(jnp.abs(unit), axis=-1, keepdims=True) + 1e-9
    gain = jax.random.uniform(k_gain, (b, c, 1), minval=0.25, maxval=0.6)
    unit = unit / peak * gain

    # ---- placement: lead silence + per-char gaps, cumsum starts ----
    lead = jnp.floor(
        jax.random.uniform(k_lead, (b,), minval=0.05, maxval=0.15) * SR)
    gaps = jnp.floor(
        jax.random.uniform(k_gap, (b, c), minval=0.02, maxval=0.07) * SR)
    ch_mask = jnp.arange(c)[None, :] < n_chars[:, None]  # (B, C)
    step = (n_u + gaps) * ch_mask
    starts = lead[:, None] + jnp.cumsum(step, axis=1) - step  # (B, C)

    t_idx = jnp.arange(n_samples, dtype=jnp.float32)
    rel = t_idx[None, None, :] - starts[..., None]  # (B, C, N)
    reli = jnp.clip(rel.astype(jnp.int32), 0, U_MAX - 1)
    placed = jnp.take_along_axis(unit, reli, axis=-1)
    valid = (rel >= 0) & (rel < n_u[..., None]) & ch_mask[..., None]
    audio = jnp.sum(placed * valid, axis=1)  # (B, N)

    tail = jnp.floor(
        jax.random.uniform(k_tail, (b,), minval=0.05, maxval=0.15) * SR)
    last_end = starts + n_u * ch_mask
    n_valid = (jnp.max(last_end, axis=1) + tail).astype(jnp.int32)
    n_valid = jnp.minimum(n_valid, n_samples)
    return {
        "audio": audio,
        "starts": starts / SR,
        "ends": (starts + n_u) / SR,
        "n_valid": n_valid,
    }


def add_noise(key, audio, n_valid, p_noise: float = 0.5,
              snr_lo: float = 12.0, snr_hi: float = 35.0):
    """White-noise augmentation matching synth_utterance(noise_snr_db=...):
    with prob p_noise, add noise at U(snr_lo, snr_hi) dB SNR."""
    b, n = audio.shape
    k_on, k_snr, k_n = jax.random.split(key, 3)
    on = jax.random.bernoulli(k_on, p_noise, (b,))
    snr = jax.random.uniform(k_snr, (b,), minval=snr_lo, maxval=snr_hi)
    noise = jax.random.normal(k_n, (b, n))
    vmask = jnp.arange(n)[None, :] < n_valid[:, None]
    sig_p = jnp.sum((audio * vmask) ** 2, axis=1) / \
        jnp.maximum(jnp.sum(vmask, axis=1), 1)
    scale = jnp.sqrt(sig_p * 10 ** (-snr / 10.0) + 1e-18)
    return audio + noise * (scale * on)[:, None] * vmask
