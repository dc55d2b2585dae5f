"""Separation losses: SI-SDR family, PIT, MixIT, freq-MAE + wav-L1.

Equivalent capability to look2hear/losses (matrix.py:5-197,
pit_wrapper.py:89-135, mixit.py:109 in the reference), built for jit:
permutation search is a static einsum over precomputed permutation
matrices (factorial path) — no Python-level loops over batch — with a
host-side Hungarian fallback for many-source cases.
"""

from __future__ import annotations

from functools import lru_cache
from itertools import permutations

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-8


def _zero_mean(x, axis=-1):
    return x - jnp.mean(x, axis=axis, keepdims=True)


def si_sdr(est: jnp.ndarray, ref: jnp.ndarray, zero_mean: bool = True) -> jnp.ndarray:
    """Scale-invariant SDR in dB over the last axis (matrix.py:5)."""
    if zero_mean:
        est, ref = _zero_mean(est), _zero_mean(ref)
    dot = jnp.sum(est * ref, axis=-1, keepdims=True)
    energy = jnp.sum(ref * ref, axis=-1, keepdims=True)
    target = dot * ref / (energy + EPS)
    noise = est - target
    t_pow = jnp.sum(target**2, axis=-1)
    # relative noise floor bounds SI-SDR at ~60 dB: near-perfect
    # reconstruction otherwise drives 1/noise gradients to overflow (the
    # NaN observed in long training runs)
    n_pow = jnp.sum(noise**2, axis=-1) + 1e-6 * t_pow + EPS
    return 10.0 * jnp.log10(t_pow / n_pow + EPS)


def sd_sdr(est: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Scale-dependent SDR (matrix.py:52): SNR of the scaled residual."""
    est, ref = _zero_mean(est), _zero_mean(ref)
    dot = jnp.sum(est * ref, axis=-1, keepdims=True)
    energy = jnp.sum(ref * ref, axis=-1, keepdims=True)
    scaled_target = dot * ref / (energy + EPS)
    noise = est - ref
    ratio = jnp.sum(scaled_target**2, axis=-1) / (jnp.sum(noise**2, axis=-1) + EPS)
    return 10.0 * jnp.log10(ratio + EPS)


def snr(est: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Plain SNR in dB (matrix.py:101)."""
    noise = est - ref
    ratio = jnp.sum(ref**2, axis=-1) / (jnp.sum(noise**2, axis=-1) + EPS)
    return 10.0 * jnp.log10(ratio + EPS)


def pairwise_neg_si_sdr(est: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """(..., S_est, T) × (..., S_ref, T) → (..., S_est, S_ref) loss matrix."""
    return -si_sdr(est[..., :, None, :], ref[..., None, :, :])


def freq_mae_wav_l1(est: jnp.ndarray, ref: jnp.ndarray, n_fft: int = 512,
                    hop: int = 128, alpha: float = 0.5) -> jnp.ndarray:
    """Magnitude-spectrum MAE + waveform L1 (matrix.py:145)."""
    from ..ops.stft import stft

    est_mag = jnp.abs(stft(est, n_fft, hop))
    ref_mag = jnp.abs(stft(ref, n_fft, hop))
    return alpha * jnp.mean(jnp.abs(est_mag - ref_mag), axis=(-2, -1)) + (
        1.0 - alpha
    ) * jnp.mean(jnp.abs(est - ref), axis=-1)


@lru_cache(maxsize=8)
def _perm_matrices(n: int) -> np.ndarray:
    """(n!, n, n) one-hot permutation matrices."""
    perms = list(permutations(range(n)))
    mats = np.zeros((len(perms), n, n), np.float32)
    for i, p in enumerate(perms):
        for row, col in enumerate(p):
            mats[i, row, col] = 1.0
    return mats


def pit_loss(loss_matrix: jnp.ndarray, method: str = "auto"):
    """Permutation-invariant minimum of a (..., S, S) pairwise loss matrix.

    Returns (loss (...,), best_perm (..., S) int). method:
      'factorial' — static einsum over all S! permutations (S ≤ 6)
      'hungarian' — scipy assignment via pure_callback (large S)
      'auto'      — factorial for S ≤ 4 else hungarian
    (reference pit_wrapper.py:89-135)."""
    s = loss_matrix.shape[-1]
    if method == "auto":
        method = "factorial" if s <= 4 else "hungarian"
    if method == "factorial":
        mats = jnp.asarray(_perm_matrices(s))  # (P, S, S)
        # cost of each permutation = sum of selected entries
        costs = jnp.einsum("...ij,pij->...p", loss_matrix, mats) / s
        best = jnp.argmin(costs, axis=-1)
        loss = jnp.take_along_axis(costs, best[..., None], axis=-1)[..., 0]
        perm_idx = jnp.argmax(jnp.asarray(_perm_matrices(s)), axis=-1)  # (P, S)
        perm = perm_idx[best]
        return loss, perm

    def _hungarian(m):
        from scipy.optimize import linear_sum_assignment

        m = np.asarray(m)
        out_loss = np.zeros(m.shape[:-2], np.float32)
        out_perm = np.zeros(m.shape[:-2] + (s,), np.int32)
        flat = m.reshape(-1, s, s)
        for i, mat in enumerate(flat):
            rows, cols = linear_sum_assignment(mat)
            np.ravel(out_loss)[i] = mat[rows, cols].mean()
            out_perm.reshape(-1, s)[i] = cols
        return out_loss, out_perm

    loss, perm = jax.pure_callback(
        _hungarian,
        (
            jax.ShapeDtypeStruct(loss_matrix.shape[:-2], jnp.float32),
            jax.ShapeDtypeStruct(loss_matrix.shape[:-2] + (s,), jnp.int32),
        ),
        loss_matrix,
    )
    return loss, perm


def pit_si_sdr_loss(est: jnp.ndarray, ref: jnp.ndarray):
    """Standard PIT −SI-SDR training loss: (B, S, T) × (B, S, T) → scalar."""
    matrix = pairwise_neg_si_sdr(est, ref)
    loss, _ = pit_loss(matrix)
    return jnp.mean(loss)


def mixit_loss(est: jnp.ndarray, mixtures: jnp.ndarray) -> jnp.ndarray:
    """Mixture-invariant training (mixit.py:109): est (B, S, T) sources are
    assigned to M=2 reference mixtures over all 2^S binary assignments;
    the best-assignment −SNR is the loss."""
    b, s, t = est.shape
    m = mixtures.shape[1]
    assert m == 2, "MixIT implemented for 2 reference mixtures"
    # all binary assignment matrices (2^S, M, S)
    n_assign = 2**s
    bits = ((np.arange(n_assign)[:, None] >> np.arange(s)[None, :]) & 1).astype(
        np.float32
    )
    assign = np.stack([bits, 1.0 - bits], axis=1)  # (A, 2, S)
    assign_j = jnp.asarray(assign)
    est_sums = jnp.einsum("ams,bst->bamt", assign_j, est)  # (B, A, M, T)
    losses = -snr(est_sums, mixtures[:, None])  # (B, A, M)
    per_assign = jnp.mean(losses, axis=-1)  # (B, A)
    return jnp.mean(jnp.min(per_assign, axis=-1))
