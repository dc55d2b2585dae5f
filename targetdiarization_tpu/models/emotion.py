"""Speech emotion recognition (emotion2vec slot).

The reference loads iic/emotion2vec_plus_large through funasr
(ASRProcessor.py:277-284, emotion_detection :935-974). Here: a compact
conv + attention classifier over fbank with the same 9-label output
contract ({'labels': [...], 'scores': [...]}, softmax scores). The
SenseVoice emotion head remains the zero-extra-cost path when that
engine is active; this model serves the dedicated `emotion_model` slot.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..runtime.buckets import BucketLadder, pad_to
from ..runtime.registry import register_model
from . import features

# emotion2vec_plus label set (ASRProcessor.py:955-967 ordering)
EMOTION_LABELS = [
    "angry", "disgusted", "fearful", "happy", "neutral", "other", "sad",
    "surprised", "unknown",
]


@register_model(name="EmotionNet")
class EmotionNet(nn.Module):
    feat_dim: int = 80
    dim: int = 128
    n_layers: int = 2
    heads: int = 4
    n_classes: int = len(EMOTION_LABELS)

    @nn.compact
    def __call__(self, feats, lengths):
        b, t, f = feats.shape
        mask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(feats.dtype)
        x = nn.Conv(self.dim, (5,), strides=(2,), name="conv1")(feats)
        x = nn.gelu(x)
        x = nn.Conv(self.dim, (5,), strides=(2,), name="conv2")(x)
        x = nn.gelu(x)
        t2 = x.shape[1]
        m2 = (jnp.arange(t2)[None, :] < jnp.maximum(lengths // 4, 1)[:, None]).astype(x.dtype)
        attn_mask = m2[:, None, None, :] > 0
        for i in range(self.n_layers):
            h = nn.LayerNorm(name=f"ln_{i}")(x)
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.heads, qkv_features=self.dim, name=f"attn_{i}"
            )(h, h, mask=attn_mask)
            x = (x + h) * m2[..., None]
        pooled = jnp.sum(x * m2[..., None], axis=1) / jnp.maximum(
            jnp.sum(m2, axis=1, keepdims=True), 1.0)
        return nn.Dense(self.n_classes, name="head")(pooled)


_SAMPLE_LADDER = BucketLadder(tuple(int(s * 16000) for s in (1, 2, 4, 8, 16, 30)))


class EmotionEngine:
    def __init__(self, params=None, model: EmotionNet | None = None, seed: int = 0,
                 compute_dtype: str | None = None):
        self.model = model or EmotionNet()
        if params is None:
            params = self.model.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, 100, 80)),
                jnp.array([100]))
        self.params = params
        from ..runtime.precision import (
            cast_inputs, cast_params, f32, resolve_compute_dtype)

        self.compute_dtype = resolve_compute_dtype(compute_dtype)
        self._params_c = cast_params(params, self.compute_dtype)

        def _fwd(p, audio, n_frames):
            feats = features.fbank(audio)
            (feats_c,) = cast_inputs(self.compute_dtype, feats)
            return f32(jax.nn.softmax(
                self.model.apply(p, feats_c, n_frames), axis=-1))

        self._apply = jax.jit(_fwd)

    @classmethod
    def from_pretrained(cls, path: str) -> "EmotionEngine":
        from ..runtime.registry import from_pretrained

        model, params = from_pretrained(path)
        return cls(params=params, model=model)

    def emotion_detection(self, audio: np.ndarray, sr: int = 16000) -> dict:
        """{'labels': [...], 'scores': [...]} (reference contract)."""
        audio = np.asarray(audio, np.float32)
        if sr != 16000:
            from ..ops.resample import resample_poly_np

            audio = resample_poly_np(audio, 16000, sr)
        t = features.num_frames(len(audio))
        if t == 0:
            return {"labels": list(EMOTION_LABELS),
                    "scores": [0.0] * len(EMOTION_LABELS)}
        bucket = _SAMPLE_LADDER.bucket(len(audio))
        padded = pad_to(audio, bucket)[None]
        scores = np.asarray(
            self._apply(self._params_c, jnp.asarray(padded), jnp.asarray([t])))[0]
        return {"labels": list(EMOTION_LABELS),
                "scores": [round(float(s), 4) for s in scores]}
