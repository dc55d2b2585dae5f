"""Perceptual speech-quality metrics: STOI and a P.862-style PESQ.

The reference's separation-eval harness logs PESQ (nb/wb) and STOI via
compiled third-party packages (look2hear/metrics/wrapper.py:28-199,
torchmetrics/pesq, pystoi), plus ONNX-weight MOS predictors (DNSMOS,
SigMOS — dnsmos.py:24-25, sigmos.py:39-42). Those weights and packages
don't exist in this environment, so (VERDICT.md round-1 item 6):

- `stoi` — a faithful implementation of the STOI algorithm (Taal et al.
  2011): 10 kHz, energy-VAD frame removal, 15 one-third-octave bands,
  384 ms segments, clipped normalized correlation. Matches the published
  algorithm step-for-step (no reference binary exists here to diff
  against bit-wise).
- `pesq` — the P.862 perceptual model: time alignment (envelope
  cross-correlation crude stage + sample-level fine refinement, the
  P.862 §8 two-stage scheme with one global delay instead of
  per-utterance delay tracking), level alignment, 32 ms Bark spectra,
  Zwicker loudness, asymmetric disturbance, L6/L2 aggregation, MOS
  mapping. Scores are comparable *within* this framework, not certified
  P.862 numbers.
- DNSMOS / SigMOS require their released ONNX weights; absent here by
  environment constraint (documented in docs/PARITY.md).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np


# ---------------------------------------------------------------------------
# STOI


@lru_cache(maxsize=4)
def _third_octave_bands(fs: int = 10000, n_fft: int = 512, n_bands: int = 15,
                        min_cf: float = 150.0):
    """Boolean (n_bands, n_fft//2+1) matrix of one-third-octave bands."""
    f = np.linspace(0, fs / 2, n_fft // 2 + 1)
    cfs = min_cf * 2.0 ** (np.arange(n_bands) / 3.0)
    lo = cfs * 2.0 ** (-1.0 / 6.0)
    hi = cfs * 2.0 ** (1.0 / 6.0)
    bands = (f[None, :] >= lo[:, None]) & (f[None, :] < hi[:, None])
    return bands.astype(np.float64)


def _resample_to(x: np.ndarray, sr: int, target: int) -> np.ndarray:
    if sr == target:
        return np.asarray(x, np.float64)
    from ..ops.resample import resample_poly_np

    return np.asarray(resample_poly_np(np.asarray(x, np.float32), target, sr),
                      np.float64)


def stoi(ref: np.ndarray, deg: np.ndarray, sr: int = 16000) -> float:
    """Short-Time Objective Intelligibility (Taal et al. 2011) in [~0, 1]."""
    fs, frame, hop, n_fft = 10000, 256, 128, 512
    n_bands, seg_len, beta_db, dyn_db = 15, 30, -15.0, 40.0
    x = _resample_to(ref, sr, fs)
    y = _resample_to(deg, sr, fs)
    n = min(len(x), len(y))
    x, y = x[:n], y[:n]
    if n < frame:
        return 0.0

    win = np.hanning(frame + 2)[1:-1]
    n_frames = 1 + (n - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    xf = x[idx] * win
    yf = y[idx] * win

    # energy-VAD on the clean signal: keep frames within dyn_db of max
    e = 20 * np.log10(np.linalg.norm(xf, axis=1) + 1e-12)
    keep = e > (e.max() - dyn_db)
    if keep.sum() <= seg_len:
        return 0.0
    xf, yf = xf[keep], yf[keep]

    X = np.fft.rfft(xf, n_fft, axis=1)
    Y = np.fft.rfft(yf, n_fft, axis=1)
    bands = _third_octave_bands(fs, n_fft, n_bands)
    Xb = np.sqrt((np.abs(X) ** 2) @ bands.T + 1e-20)  # (frames, bands)
    Yb = np.sqrt((np.abs(Y) ** 2) @ bands.T + 1e-20)

    m = Xb.shape[0] - seg_len + 1
    c = 10.0 ** (-beta_db / 20.0)
    d_sum, d_cnt = 0.0, 0
    for i in range(m):
        xs = Xb[i: i + seg_len]  # (seg, bands)
        ys = Yb[i: i + seg_len]
        alpha = np.linalg.norm(xs, axis=0) / (np.linalg.norm(ys, axis=0) + 1e-20)
        ys_n = ys * alpha[None, :]
        ys_c = np.minimum(ys_n, xs * (1 + c))
        xm = xs - xs.mean(axis=0, keepdims=True)
        ym = ys_c - ys_c.mean(axis=0, keepdims=True)
        num = np.sum(xm * ym, axis=0)
        den = np.linalg.norm(xm, axis=0) * np.linalg.norm(ym, axis=0) + 1e-20
        d_sum += float(np.sum(num / den))
        d_cnt += xs.shape[1]
    return d_sum / max(d_cnt, 1)


# ---------------------------------------------------------------------------
# PESQ (P.862-style perceptual model)


@lru_cache(maxsize=4)
def _bark_bands(fs: int, n_fft: int, n_bark: int):
    """(n_bark, bins) averaging matrix over a Bark-warped axis plus the
    band center frequencies in Hz."""
    f = np.linspace(0, fs / 2, n_fft // 2 + 1)
    bark = 6.0 * np.arcsinh(f / 600.0)  # Wang/Sekey-Hanson approximation
    edges = np.linspace(bark[1], bark[-1], n_bark + 1)
    mat = np.zeros((n_bark, len(f)))
    for b in range(n_bark):
        sel = (bark >= edges[b]) & (bark < edges[b + 1])
        if sel.any():
            mat[b, sel] = 1.0 / sel.sum()
        else:  # narrow low bands: nearest bin
            j = int(np.argmin(np.abs(bark - 0.5 * (edges[b] + edges[b + 1]))))
            mat[b, j] = 1.0
    centers = 600.0 * np.sinh(0.5 * (edges[:-1] + edges[1:]) / 6.0)
    return mat, centers


def _abs_threshold(f_hz: np.ndarray) -> np.ndarray:
    """Terhardt absolute hearing threshold (dB SPL) at band centers."""
    f_k = np.maximum(f_hz, 20.0) / 1000.0
    return (3.64 * f_k ** -0.8
            - 6.5 * np.exp(-0.6 * (f_k - 3.3) ** 2)
            + 1e-3 * f_k ** 4)


def estimate_delay(ref: np.ndarray, deg: np.ndarray, fs: int,
                   max_delay_s: float = 0.5) -> int:
    """Delay of `deg` relative to `ref` in samples (positive = deg is
    late), via the P.862-style two-stage scheme: crude alignment by
    cross-correlating 4 ms log-energy envelopes, then sample-level
    refinement by waveform cross-correlation in a ±1-envelope-hop
    window around the crude estimate (reference time-alignment stage
    the torchmetrics/pesq binary performs; wrapper.py:28-40)."""
    hop = max(fs * 4 // 1000, 1)  # 4 ms envelope resolution
    n = min(len(ref), len(deg))
    x, y = np.asarray(ref[:n], np.float64), np.asarray(deg[:n], np.float64)
    m = n // hop
    if m < 8:
        return 0
    ex = np.log(np.mean(x[: m * hop].reshape(m, hop) ** 2, axis=1) + 1e-12)
    ey = np.log(np.mean(y[: m * hop].reshape(m, hop) ** 2, axis=1) + 1e-12)
    ex -= ex.mean()
    ey -= ey.mean()
    max_lag = min(int(max_delay_s * fs) // hop, m - 1)
    # full cross-correlation via FFT, then restrict to the search window
    size = 1 << int(np.ceil(np.log2(2 * m)))
    c = np.fft.irfft(np.fft.rfft(ey, size) * np.conj(np.fft.rfft(ex, size)),
                     size)
    lags = np.arange(-max_lag, max_lag + 1)
    crude = int(lags[np.argmax(c[lags])]) * hop
    # fine stage: waveform cross-correlation within ±hop of the crude lag
    best_lag, best_val = crude, -np.inf
    for lag in range(crude - hop, crude + hop + 1):
        if lag >= 0:
            a, b = x[: n - lag], y[lag:]
        else:
            a, b = x[-lag:], y[: n + lag]
        if len(a) < hop:
            continue
        v = float(np.dot(a, b)) / (np.linalg.norm(a) * np.linalg.norm(b)
                                   + 1e-20)
        if v > best_val:
            best_val, best_lag = v, lag
    return best_lag


def _apply_delay(x: np.ndarray, y: np.ndarray, delay: int):
    """Crop both signals to their overlapping region given y's delay."""
    if delay > 0:
        y = y[delay:]
    elif delay < 0:
        x = x[-delay:]
    n = min(len(x), len(y))
    return x[:n], y[:n]


def pesq(ref: np.ndarray, deg: np.ndarray, sr: int = 16000,
         mode: str = "wb") -> float:
    """P.862-style MOS-LQO in roughly [1.0, 4.64].

    Perceptual model per P.862 (time alignment → Bark spectra → Zwicker
    loudness → asymmetric disturbance → L6-over-syllables / L2-over-time
    → MOS); see module docstring for scope.
    """
    fs = 16000 if mode == "wb" else 8000
    x = _resample_to(ref, sr, fs)
    y = _resample_to(deg, sr, fs)
    n = min(len(x), len(y))
    x, y = x[:n], y[:n]
    x, y = _apply_delay(x, y, estimate_delay(x, y, fs))
    n = len(x)
    frame = fs * 32 // 1000
    hop = frame // 2
    if n < 2 * frame:
        return 1.0

    # level alignment: scale both to a common active-speech power
    def _active_power(s):
        seg = s[: len(s) // hop * hop].reshape(-1, hop)
        p = np.mean(seg ** 2, axis=1)
        act = p > (p.max() * 1e-3)
        return np.mean(p[act]) if act.any() else np.mean(p) + 1e-20

    target_p = 1e-2
    x = x * np.sqrt(target_p / (_active_power(x) + 1e-20))
    y = y * np.sqrt(target_p / (_active_power(y) + 1e-20))

    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(frame) / frame)
    n_frames = 1 + (n - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    X = np.abs(np.fft.rfft(x[idx] * win, axis=1)) ** 2
    Y = np.abs(np.fft.rfft(y[idx] * win, axis=1)) ** 2

    n_bark = 49 if mode == "wb" else 42
    mat, centers = _bark_bands(fs, frame, n_bark)
    Px = X @ mat.T  # (frames, bark) pitch-power densities
    Py = Y @ mat.T

    # per-band partial gain compensation of the degraded signal toward
    # the reference (telephone-channel equalisation stage of P.862)
    mean_x = Px.mean(axis=0) + 1e4
    mean_y = Py.mean(axis=0) + 1e4
    gain = np.clip(mean_x / mean_y, 10 ** (-2.0), 10 ** 2.0)
    Py = Py * gain[None, :]

    # intensity → loudness (Zwicker law, exponent 0.23)
    p0 = 10.0 ** (_abs_threshold(centers) / 10.0)  # threshold power
    sl = 120.0  # loudness scale (see mapping calibration below)

    def loud(P):
        ratio = (0.5 * p0[None, :] + 0.5 * P) / p0[None, :]
        return sl * (ratio ** 0.23 - 1.0)

    Lx = np.maximum(loud(Px), 0.0)
    Ly = np.maximum(loud(Py), 0.0)

    # disturbance with masking deadzone
    d = Ly - Lx
    m_mask = 0.25 * np.minimum(Lx, Ly)
    d = np.sign(d) * np.maximum(np.abs(d) - m_mask, 0.0)

    # symmetric disturbance: L2 over bark per frame
    d_frame = np.sqrt(np.sum(d ** 2, axis=1))
    # asymmetric: additions (noise) weighted harder than omissions
    asym = np.clip(((Py + 50.0) / (Px + 50.0)) ** 1.2, 0.0, 12.0)
    asym[asym < 3.0] = 0.0
    da_frame = np.sum(np.abs(d) * asym, axis=1)

    # weight silent frames down by frame energy
    e_frame = np.sqrt(np.mean(x[idx] ** 2, axis=1)) + 1e-12
    w = (e_frame / e_frame.max()) ** 0.04

    def agg(dv):
        # L6 over ~320 ms syllables, then L2 over syllables
        dv = dv * w
        syl = max(len(dv) // 20, 1)
        chunks = np.array_split(dv, syl)
        l6 = np.array([np.mean(np.abs(c) ** 6) ** (1 / 6) for c in chunks])
        return float(np.sqrt(np.mean(l6 ** 2)))

    d_sym = agg(d_frame)
    d_asym = agg(da_frame)
    # Disturbance → raw quality. Calibrated (grid fit over the weight
    # and compression exponent) against the published P.862 anchor
    # behaviors on speech + AWGN (MOS-LQO ≈ 1.2/1.6/2.0/2.45/2.9/3.35/
    # 3.8/4.15/4.4 at 0..40 dB SNR in 5 dB steps) and MNRU
    # (≈ 4.45/3.9/2.7/1.2 at Q = 35/25/15/5 dB); the fitted curve lands
    # within ≤0.45 MOS of every anchor point (RMSE 0.22). Not a
    # certified P.862 implementation — docs/PARITY.md states exactly
    # what the conformance battery (tests/test_train.py::
    # TestPESQConformance) does and does not certify.
    raw = 4.5 - 1.15 * (d_sym + 0.309 * d_asym) ** 0.28
    # P.862.1-style logistic mapping to MOS-LQO
    mos = 0.999 + 4.0 / (1.0 + np.exp(-1.3669 * raw + 3.8224))
    return float(np.clip(mos, 1.0, 4.64))
