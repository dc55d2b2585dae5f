"""Bucket ladders: pad variable-length audio to a fixed shape menu.

The reference feeds arbitrary-length tensors to every model (e.g. VAD
segments of any duration into the speaker-embedding net,
/root/reference/TargetASR.py:155-258). Under XLA that would recompile per
length; instead every device entry point here pads to the nearest rung of
a per-stage ladder and carries an explicit length so masked ops (mean
pooling, LayerNorm statistics, attention) ignore the padding exactly
(SURVEY.md §7.4 item 2).
"""

from __future__ import annotations

import bisect
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

# Audio-seconds ladder shared by embedding/VAD stages: 1..30 s @16 kHz.
DEFAULT_AUDIO_LADDER = (1, 2, 4, 8, 16, 30)


@dataclass(frozen=True)
class BucketLadder:
    """A sorted menu of allowed lengths (in samples or frames)."""

    rungs: tuple = field(default_factory=tuple)

    @classmethod
    def from_seconds(cls, seconds=DEFAULT_AUDIO_LADDER, sr: int = 16000) -> "BucketLadder":
        return cls(tuple(int(s * sr) for s in seconds))

    def bucket(self, n: int) -> int:
        """Smallest rung >= n; the top rung if n exceeds the ladder."""
        i = bisect.bisect_left(self.rungs, n)
        return self.rungs[min(i, len(self.rungs) - 1)]

    def split_plan(self, n: int) -> list:
        """Lengths covering n: repeated top rungs plus one bucketed tail."""
        top = self.rungs[-1]
        plan = [top] * (n // top)
        rem = n - top * (n // top)
        if rem or not plan:
            plan.append(self.bucket(max(rem, 1)))
        return plan


def pad_to(x, n: int, axis: int = -1, value: float = 0.0):
    """Pad array x along `axis` to length n (no-op if already n)."""
    xp = jnp if isinstance(x, jnp.ndarray) else np
    cur = x.shape[axis]
    if cur == n:
        return x
    if cur > n:
        raise ValueError(f"length {cur} exceeds bucket {n}")
    pad = [(0, 0)] * x.ndim
    pad[axis if axis >= 0 else x.ndim + axis] = (0, n - cur)
    return xp.pad(x, pad, constant_values=value)


def pad_to_bucket(x, ladder: BucketLadder, axis: int = -1):
    """Pad to the ladder's rung; returns (padded, original_length)."""
    n = x.shape[axis]
    return pad_to(x, ladder.bucket(n), axis=axis), n


def length_mask(lengths, max_len: int, dtype=jnp.float32):
    """(B,) lengths → (B, max_len) {0,1} validity mask."""
    lengths = jnp.asarray(lengths)
    if lengths.ndim == 0:
        lengths = lengths[None]
    return (jnp.arange(max_len)[None, :] < lengths[:, None]).astype(dtype)


def masked_mean(x, mask, axis, eps: float = 1e-9):
    """Mean of x over `axis` counting only mask==1 positions.

    mask must broadcast against x. The denominator uses the mask sum so
    padded positions change nothing (exact-mask rule, SURVEY.md §7.4.2).
    """
    num = jnp.sum(x * mask, axis=axis)
    den = jnp.sum(mask, axis=axis)
    return num / jnp.maximum(den, eps)
