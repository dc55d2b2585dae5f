"""Speaker-embedding models (192-d) + speaker verification engine.

TPU-native replacements for the modelscope SV pipelines the reference
keys by model family — eres2netv2_large / eres2netv2 / eres2net / campp
(TargetASR.py:98-109) — and for the embedding/similarity/target-selection
logic in TargetASR (get_speaker_embedding :155, get_target_embedding
:166, cosine_similarity :144, is_same_person :491).

Two architectures, both consuming 80-d fbank with per-utterance CMN:

- ERes2NetV2: Res2Net-style 2-D CNN over (freq, time) with multi-scale
  hierarchical convs, attentional feature fusion on the residual path,
  and attentive statistics pooling. Conv-heavy → maps straight onto the
  MXU as implicit GEMMs; all shapes static per time bucket.
- CAMPlusPlus: conv front-end (FCM) + densely connected TDNN with
  context-aware masking (CAM) blocks and global statistics pooling —
  the lighter model, also used for diarization sliding windows.

Batch API: unlike the reference's per-segment Python loop
(TargetDiarization.py:589-593), `embed_batch` packs every VAD segment of
a bucket into one padded batch so one forward saturates the MXU.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..runtime.buckets import BucketLadder, pad_to
from ..runtime.registry import register_model
from ..runtime.trace import trace
from . import features

EMBED_DIM = 192
MAX_EMBED_SECONDS = 30.0  # reference truncates SV input at 30 s (TargetASR.py:222-224)

# sample ladder for embedding forwards (1..30 s @16 kHz)
_SAMPLE_LADDER = BucketLadder(tuple(int(s * 16000) for s in (1, 2, 4, 8, 16, 30)))


def _time_mask(lengths, t, dtype=jnp.float32):
    return (jnp.arange(t)[None, :] < lengths[:, None]).astype(dtype)


class AttentiveStatsPool(nn.Module):
    """Masked attentive statistics pooling: (B, T, D) → (B, 2D)."""

    hidden: int = 128

    @nn.compact
    def __call__(self, x, mask):
        # mask: (B, T)
        a = nn.tanh(nn.Dense(self.hidden, name="att_w")(x))
        a = nn.Dense(1, name="att_v")(a)[..., 0]  # (B, T)
        a = jnp.where(mask > 0, a, -1e9)
        a = jax.nn.softmax(a, axis=-1)[..., None]  # (B, T, 1)
        mean = jnp.sum(a * x, axis=1)
        var = jnp.sum(a * jnp.square(x), axis=1) - jnp.square(mean)
        std = jnp.sqrt(jnp.maximum(var, 1e-7))
        return jnp.concatenate([mean, std], axis=-1)


class AFF(nn.Module):
    """Attentional feature fusion: gate two branches channel-wise."""

    channels: int

    @nn.compact
    def __call__(self, a, b):
        z = a + b
        g = nn.Conv(self.channels // 2, (1, 1), name="gate_down")(z)
        g = nn.relu(nn.GroupNorm(num_groups=None, group_size=1, name="gate_norm")(g))
        g = nn.Conv(self.channels, (1, 1), name="gate_up")(g)
        w = nn.sigmoid(g)
        return a * w + b * (1.0 - w)


class Res2Block(nn.Module):
    """Res2Net basic block with hierarchical multi-scale 3×3 convs."""

    channels: int
    scale: int = 4
    stride: tuple = (1, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.channels // self.scale
        # downsample (if any) happens in the reduce conv so every
        # hierarchical branch shares one spatial shape
        y = nn.Conv(
            self.channels, (1, 1), strides=self.stride, use_bias=False, name="reduce"
        )(x)
        y = nn.BatchNorm(use_running_average=not train, name="bn1")(y)
        y = nn.relu(y)
        splits = jnp.split(y, self.scale, axis=-1)
        outs = [splits[0]]
        prev = None
        for i in range(1, self.scale):
            inp = splits[i] if prev is None else splits[i] + prev
            h = nn.Conv(w, (3, 3), use_bias=False, name=f"conv_{i}")(inp)
            h = nn.BatchNorm(use_running_average=not train, name=f"bn_{i}")(h)
            h = nn.relu(h)
            outs.append(h)
            prev = h
        y = jnp.concatenate(outs, axis=-1)
        y = nn.Conv(self.channels, (1, 1), use_bias=False, name="expand")(y)
        y = nn.BatchNorm(use_running_average=not train, name="bn2")(y)
        if x.shape != y.shape:
            sc = nn.Conv(
                self.channels, (1, 1), strides=self.stride, use_bias=False,
                name="shortcut",
            )(x)
            sc = nn.BatchNorm(use_running_average=not train, name="bn_sc")(sc)
        else:
            sc = x
        out = AFF(self.channels, name="aff")(y, sc)
        return nn.relu(out)


@register_model(name="ERes2NetV2")
class ERes2NetV2(nn.Module):
    """Res2Net speaker embedder; `large` preset ≈ the reference's
    eres2netv2_large (w24s4: width 24, scale 4)."""

    feat_dim: int = 80
    channels: int = 24  # stem width (w24)
    scale: int = 4
    blocks: tuple = (1, 1, 1, 1)
    embed_dim: int = EMBED_DIM

    @nn.compact
    def __call__(self, feats, lengths, train: bool = False):
        # feats: (B, T, F) → NHWC image (B, T, F, 1)
        b, t, f = feats.shape
        mask = _time_mask(lengths, t)
        x = feats[..., None] * mask[..., None, None]
        x = nn.Conv(self.channels, (3, 3), use_bias=False, name="stem")(x)
        x = nn.BatchNorm(use_running_average=not train, name="stem_bn")(x)
        x = nn.relu(x)
        c = self.channels
        strides = [(1, 1), (2, 2), (2, 2), (2, 2)]
        for si, (n_blocks, st) in enumerate(zip(self.blocks, strides)):
            c_out = self.channels * (2 ** si)
            for bi in range(n_blocks):
                x = Res2Block(
                    channels=c_out,
                    scale=self.scale,
                    stride=st if bi == 0 else (1, 1),
                    name=f"stage{si}_block{bi}",
                )(x, train=train)
            c = c_out
        # (B, T', F', C) → per-frame vector (B, T', F'*C)
        bt, tt, ff, cc = x.shape
        h = x.reshape(bt, tt, ff * cc)
        # time mask at the downsampled rate
        ds = t // tt if tt else 1
        m2 = _time_mask(jnp.maximum(lengths // ds, 1), tt)
        pooled = AttentiveStatsPool(name="asp")(h, m2)
        emb = nn.Dense(self.embed_dim, name="embedding")(pooled)
        return emb  # (B, 192)


class CAMLayer(nn.Module):
    """TDNN layer with context-aware masking + dense (concat) growth."""

    bottleneck: int
    growth: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        # x: (B, T, D); mask (B, T)
        h = nn.BatchNorm(use_running_average=not train, name="bn1")(x)
        h = nn.relu(h)
        h = nn.Dense(self.bottleneck, use_bias=False, name="bottleneck")(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn2")(h)
        h = nn.relu(h)
        h = nn.Conv(
            self.growth, (3,), kernel_dilation=(self.dilation,),
            padding="SAME", use_bias=False, name="tdnn",
        )(h * mask[..., None])
        # context-aware mask: global masked mean → excitation gate
        m = mask[..., None]
        ctx = jnp.sum(h * m, axis=1, keepdims=True) / jnp.maximum(
            jnp.sum(m, axis=1, keepdims=True), 1e-6
        )
        g = nn.Dense(self.growth // 2, name="cam_down")(ctx)
        g = nn.relu(g)
        g = nn.sigmoid(nn.Dense(self.growth, name="cam_up")(g))
        h = h * g
        return jnp.concatenate([x, h * m], axis=-1)


@register_model(name="CAMPlusPlus")
class CAMPlusPlus(nn.Module):
    """D-TDNN with context-aware masking; the reference's `campp` SV
    family and the embedding net of its CAM++ diarization pipeline."""

    feat_dim: int = 80
    init_channels: int = 128
    growth: int = 32
    bottleneck: int = 64
    block_layers: tuple = (4, 6, 8)
    embed_dim: int = EMBED_DIM

    @nn.compact
    def __call__(self, feats, lengths, train: bool = False):
        b, t, f = feats.shape
        mask = _time_mask(lengths, t)
        # FCM front-end: 2-D conv stack halving freq twice
        x = feats[..., None] * mask[..., None, None]  # (B, T, F, 1)
        x = nn.relu(nn.Conv(32, (3, 3), strides=(1, 2), use_bias=False, name="fcm1")(x))
        x = nn.relu(nn.Conv(32, (3, 3), strides=(1, 2), use_bias=False, name="fcm2")(x))
        x = x.reshape(b, t, -1)  # (B, T, 32*F/4)
        x = nn.Conv(self.init_channels, (5,), padding="SAME", use_bias=False, name="tdnn_in")(
            x * mask[..., None]
        )
        for bi, n_layers in enumerate(self.block_layers):
            for li in range(n_layers):
                x = CAMLayer(
                    bottleneck=self.bottleneck,
                    growth=self.growth,
                    dilation=(1, 2, 3)[bi],
                    name=f"block{bi}_layer{li}",
                )(x, mask, train=train)
            # transition: compress channels by half
            x = nn.Dense(x.shape[-1] // 2, use_bias=False, name=f"transit{bi}")(
                nn.relu(nn.BatchNorm(use_running_average=not train, name=f"tbn{bi}")(x))
            )
        m = mask[..., None]
        mean = jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1e-6)
        var = jnp.sum(jnp.square(x) * m, axis=1) / jnp.maximum(
            jnp.sum(m, axis=1), 1e-6
        ) - jnp.square(mean)
        pooled = jnp.concatenate([mean, jnp.sqrt(jnp.maximum(var, 1e-7))], axis=-1)
        return nn.Dense(self.embed_dim, name="embedding")(pooled)


# ---------------- engine ----------------


def cosine_similarity(e1, e2) -> float:
    """Plain cosine in [-1, 1] (reference TargetASR.py:144-153)."""
    e1 = np.asarray(e1, np.float64).ravel()
    e2 = np.asarray(e2, np.float64).ravel()
    n1, n2 = np.linalg.norm(e1), np.linalg.norm(e2)
    if n1 == 0 or n2 == 0:
        return 0.0
    return float(np.dot(e1, e2) / (n1 * n2))


_MODEL_PRESETS = {
    "eres2netv2_large": dict(cls="ERes2NetV2", args=dict(channels=24, blocks=(2, 2, 2, 2))),
    "eres2netv2": dict(cls="ERes2NetV2", args=dict(channels=24, blocks=(1, 1, 1, 1))),
    "eres2net": dict(cls="ERes2NetV2", args=dict(channels=16, blocks=(1, 1, 1, 1))),
    "campp": dict(cls="CAMPlusPlus", args=dict()),
}


class SpeakerEngine:
    """Embedding extraction + verification + target-speaker selection."""

    def __init__(
        self,
        params=None,
        model: nn.Module | None = None,
        model_name: str = "eres2netv2_large",
        seed: int = 0,
        compute_dtype: str | None = None,
    ):
        if model is None:
            preset = _MODEL_PRESETS[model_name]
            cls = {"ERes2NetV2": ERes2NetV2, "CAMPlusPlus": CAMPlusPlus}[preset["cls"]]
            model = cls(**preset["args"])
        self.model = model
        self.model_name = model_name
        if params is None:
            variables = self.model.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, 100, self.model.feat_dim)),
                jnp.array([100]),
            )
            params = variables
        self.params = params
        from ..runtime.precision import resolve_compute_dtype, cast_params, cast_inputs, f32

        self.compute_dtype = resolve_compute_dtype(compute_dtype)
        self._params_c = cast_params(params, self.compute_dtype)

        def _embed(params, audio, n_frames):
            # fbank + per-utterance CMN + forward in ONE dispatch;
            # audio arrives int16 — half the upload bytes
            from ..runtime.precision import dequantize_audio

            audio = dequantize_audio(audio)
            feats = features.fbank(audio)  # (B, T, 80)
            t = feats.shape[1]
            fmask = (jnp.arange(t)[None, :] < n_frames[:, None]).astype(
                jnp.float32)[..., None]
            mean = jnp.sum(feats * fmask, axis=1, keepdims=True) / jnp.maximum(
                jnp.sum(fmask, axis=1, keepdims=True), 1.0)
            feats = (feats - mean) * fmask
            (feats_c,) = cast_inputs(self.compute_dtype, feats)
            return f32(self.model.apply(params, feats_c, n_frames, train=False))

        self._embed = jax.jit(_embed)

    @classmethod
    def from_pretrained(cls, path: str) -> "SpeakerEngine":
        from ..runtime.registry import from_pretrained

        model, params = from_pretrained(path)
        return cls(params=params, model=model)

    # -------- embedding extraction --------

    def embed_batch(self, audios: list, sr: int = 16000,
                    single_dispatch: bool = False) -> np.ndarray:
        """(N, 192) embeddings for a list of audio arrays: one padded
        batched device dispatch per sample bucket (fbank + CMN + forward
        fused in the jitted program). single_dispatch=True pads ALL clips
        to one shared bucket — more padded compute, but exactly one
        device round trip (wins when link latency dominates)."""
        max_n = int(MAX_EMBED_SECONDS * sr)
        clips = []
        for a in audios:
            a = np.asarray(a, np.float32).ravel()[:max_n]
            if sr != 16000 and a.size:
                from ..ops.resample import resample_poly_np

                a = resample_poly_np(a, 16000, sr)
            clips.append(a)
        out = np.zeros((len(clips), EMBED_DIM), np.float32)
        by_bucket: dict = {}
        valid = [i for i, a in enumerate(clips)
                 if features.num_frames(len(a)) > 0]
        if single_dispatch and valid:
            top = _SAMPLE_LADDER.bucket(max(len(clips[i]) for i in valid))
            by_bucket[top] = valid
        else:
            for i in valid:
                by_bucket.setdefault(
                    _SAMPLE_LADDER.bucket(len(clips[i])), []).append(i)
        for bucket, idxs in by_bucket.items():
            batch = np.stack([pad_to(clips[i], bucket) for i in idxs])
            n_frames = np.array(
                [features.num_frames(len(clips[i])) for i in idxs])
            with trace(f"speaker/embed_bucket_{bucket}"):
                from ..runtime.precision import quantize_i16

                emb = np.asarray(self._embed(
                    self._params_c, jnp.asarray(quantize_i16(batch)),
                    jnp.asarray(n_frames)))
            for j, i in enumerate(idxs):
                out[i] = emb[j]
        return out

    def get_speaker_embedding(self, audio, sr: int = 16000) -> np.ndarray:
        """Single-utterance 192-d embedding (zero vector on too-short
        input, mirroring the reference's zero-fallback)."""
        return self.embed_batch([audio], sr=sr)[0]

    # -------- verification --------

    def is_same_person(self, emb_a, emb_b, threshold: float = 0.4):
        """(bool, score) — reference TargetASR.py:491-506."""
        score = cosine_similarity(emb_a, emb_b)
        return bool(score >= threshold), score

    # -------- target selection --------

    def get_target_embedding(
        self,
        audio,
        sr: int = 16000,
        vad_segments: list | None = None,
        min_cluster_size: int = 2,
    ) -> np.ndarray:
        """Robust enrollment embedding from possibly multi-speaker audio.

        Mirrors reference TargetASR.get_target_embedding (:166-258):
        per-VAD-segment embeddings → density clustering → the largest
        cluster's mean embedding; falls back to the whole-audio
        embedding when clustering is degenerate. Uses sklearn HDBSCAN
        (the Cython hdbscan package is not in this image).
        """
        audio = np.asarray(audio, np.float32)
        if vad_segments is None:
            segs = [[0.0, len(audio) / sr]]
        else:
            segs = vad_segments
        clips = [audio[int(s * sr): int(e * sr)] for s, e in segs]
        clips = [c for c in clips if c.size >= int(0.3 * sr)]
        if not clips:
            return self.get_speaker_embedding(audio, sr)
        embs = self.embed_batch(clips, sr=sr)
        valid = ~np.any(np.isnan(embs), axis=1) & (np.linalg.norm(embs, axis=1) > 0)
        embs = embs[valid]
        if len(embs) == 0:
            return np.zeros(EMBED_DIM, np.float32)
        if len(embs) < max(min_cluster_size, 2):
            return embs.mean(axis=0)
        try:
            from sklearn.cluster import HDBSCAN

            norm = embs / np.linalg.norm(embs, axis=1, keepdims=True)
            labels = HDBSCAN(min_cluster_size=min_cluster_size).fit_predict(norm)
        except Exception:
            labels = np.zeros(len(embs), np.int64)
        core = labels[labels >= 0]
        if core.size == 0:
            return embs.mean(axis=0)
        top = np.bincount(core).argmax()
        return embs[labels == top].mean(axis=0)
