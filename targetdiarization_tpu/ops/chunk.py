"""Fixed-shape windowed chunking + overlap-add reconstruction.

The reference handles long audio by dynamic chunk loops (MDX 15 s
chunks with 1 s margins AudioProcessor.py:602-706; separation 160 k
windows :885-948; generic overlap-add separator.py:72-131). On TPU we
instead build *static* chunk batches: pad the signal to a whole number
of windows, run one batched forward (all windows in one MXU-saturating
batch), and reconstruct with a scatter-add + weight normalization.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def chunk_signal(
    x: jnp.ndarray, window: int, hop: int | None = None
) -> tuple[jnp.ndarray, int]:
    """Pad-and-slice (T,) → (n_chunks, window) with stride `hop`.

    Returns (chunks, original_length). n_chunks is a static function of
    len(x), so each (length-bucket, window) pair compiles once.
    """
    hop = hop or window
    n = x.shape[-1]
    n_chunks = max(1, -(-max(n - window, 0) // hop) + 1)
    padded_len = (n_chunks - 1) * hop + window
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, padded_len - n)])
    idx = jnp.arange(window)[None, :] + hop * jnp.arange(n_chunks)[:, None]
    return x[..., idx], n


def merge_chunks(
    chunks: jnp.ndarray,
    length: int,
    hop: int | None = None,
    window_fn: str = "rect",
) -> jnp.ndarray:
    """Overlap-add (..., n_chunks, window) back to (..., length).

    window_fn: 'rect' (plain average in overlaps) or 'tri' (triangular
    cross-fade, equivalent to the reference's margin-trim stitching).
    """
    n_chunks, window = chunks.shape[-2], chunks.shape[-1]
    hop = hop or window
    out_len = (n_chunks - 1) * hop + window
    if window_fn == "tri":
        w = np.minimum(np.arange(1, window + 1), np.arange(window, 0, -1)).astype(
            np.float32
        )
        w /= w.max()
    else:
        w = np.ones(window, dtype=np.float32)
    wj = jnp.asarray(w)
    idx = (jnp.arange(window)[None, :] + hop * jnp.arange(n_chunks)[:, None]).reshape(-1)
    num = jnp.zeros(chunks.shape[:-2] + (out_len,), chunks.dtype)
    num = num.at[..., idx].add((chunks * wj).reshape(chunks.shape[:-2] + (-1,)))
    den = jnp.zeros(out_len, jnp.float32).at[idx].add(jnp.tile(wj, n_chunks))
    return (num / jnp.maximum(den, 1e-8))[..., :length]
