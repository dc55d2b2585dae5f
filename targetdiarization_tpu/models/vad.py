"""FSMN voice-activity detection: model + segmenting state machine.

Single TPU-native replacement for BOTH VAD engines the reference uses:
FunASR FSMN-VAD (ASRProcessor.py:256, vad_detection :742-817) and
TorchScript silero-vad (TargetASR.py:110, get_speech_timestamps
:293) — SURVEY.md §2.3 calls for exactly this consolidation.

Design: stacked cFSMN blocks — a linear projection plus a depthwise
temporal memory convolution (left context `lorder`, small lookahead
`rorder`) with residual connections — ending in a 2-class frame
classifier at 100 fps. All convs are causal-ish with a bounded right
context, so the streaming engine carries a (lorder+rorder)-frame state
and produces bit-identical probabilities to the offline path.

The segmenting state machine mirrors the reference semantics:
hysteresis on/off thresholds, max_end_silence_time to close a segment,
speech padding, then min-clip merging and max-clip splitting
(ASRProcessor.py:762-798).
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.dwconv import DepthwiseConv1d
from ..runtime.buckets import BucketLadder, pad_to
from ..runtime.registry import register_model
from . import features


class FsmnBlock(nn.Module):
    """cFSMN block: down-project, temporal memory conv, up-project, residual."""

    hidden: int = 128
    proj: int = 64
    lorder: int = 10
    rorder: int = 2
    dilation: int = 1

    @nn.compact
    def __call__(self, x, mask):
        # x: (B, T, hidden); mask: (B, T, 1)
        p = nn.Dense(self.proj, use_bias=False, name="down")(x)
        p = p * mask
        k = self.lorder + self.rorder + 1
        # depthwise temporal conv = the FSMN "memory"; zero padding keeps
        # the valid region independent of bucket padding (mask applied
        # before the conv so padded frames contribute nothing).
        mem = DepthwiseConv1d(
            features=self.proj,
            kernel_size=k,
            dilation=self.dilation,
            padding=(self.lorder * self.dilation, self.rorder * self.dilation),
            name="memory",
        )(p)
        p = p + mem
        h = nn.relu(nn.Dense(self.hidden, name="up")(p))
        return (x + h) * mask


@register_model(name="FsmnVADNet")
class FsmnVADNet(nn.Module):
    """Frame-level speech/non-speech classifier at 100 fps."""

    in_dim: int = 80
    hidden: int = 128
    proj: int = 64
    n_layers: int = 4
    lorder: int = 10
    rorder: int = 2

    @nn.compact
    def __call__(self, feats, lengths):
        # feats: (B, T, in_dim); lengths: (B,)
        mask = (jnp.arange(feats.shape[1])[None, :] < lengths[:, None]).astype(
            feats.dtype
        )[..., None]
        x = nn.relu(nn.Dense(self.hidden, name="in_proj")(feats)) * mask
        for i in range(self.n_layers):
            x = FsmnBlock(
                hidden=self.hidden,
                proj=self.proj,
                lorder=self.lorder,
                rorder=self.rorder,
                name=f"fsmn_{i}",
            )(x, mask)
        logits = nn.Dense(2, name="out_proj")(x)
        return logits  # (B, T, 2); speech prob = softmax[..., 1]

    @property
    def right_context(self) -> int:
        return self.rorder * self.n_layers


@dataclass
class VADConfig:
    """Segmenting knobs; defaults follow the reference's FunASR config
    surface (ASRProcessor.py:742-817)."""

    threshold_on: float = 0.5
    threshold_off: float = 0.35
    max_end_silence_time: float = 0.8  # s of silence that closes a segment
    min_speech_duration: float = 0.1  # drop shorter blips
    speech_pad: float = 0.05  # s padded on both sides
    min_clip_sec: float = 0.0  # merge clips shorter than this
    max_clip_sec: float = 0.0  # split clips longer than this (0 = off)


# sample ladder: 1 s .. 30 s @16 kHz
_SAMPLE_LADDER = BucketLadder(tuple(int(s * 16000) for s in (1, 2, 4, 8, 16, 30)))


class VADEngine:
    """High-level VAD API: probabilities, segments, streaming state."""

    def __init__(self, params=None, model: FsmnVADNet | None = None, seed: int = 0,
                 compute_dtype: str | None = None):
        self.model = model or FsmnVADNet()
        if params is None:
            rng = jax.random.PRNGKey(seed)
            params = self.model.init(
                rng, jnp.zeros((1, 100, self.model.in_dim)), jnp.array([100])
            )
        self.params = params
        from ..runtime.precision import resolve_compute_dtype, cast_params, cast_inputs, f32

        self.compute_dtype = resolve_compute_dtype(compute_dtype)
        self._params_c = cast_params(params, self.compute_dtype)

        def _probs(params, audio, n_frames):
            # fbank + forward in ONE dispatch (host-link round trips
            # dominate per-chunk latency through the TPU tunnel);
            # audio arrives int16 — half the upload bytes
            from ..runtime.precision import dequantize_audio

            audio = dequantize_audio(audio)
            feats = features.fbank(audio)
            (feats_c,) = cast_inputs(self.compute_dtype, feats)
            logits = self.model.apply(params, feats_c, n_frames)
            return f32(jax.nn.softmax(logits, axis=-1)[..., 1])

        self._probs = jax.jit(_probs)

    @classmethod
    def from_pretrained(cls, path: str) -> "VADEngine":
        from ..runtime.registry import from_pretrained

        model, params = from_pretrained(path)
        return cls(params=params, model=model)

    # ---------------- frame probabilities ----------------

    def frame_probs(self, audio: np.ndarray, sr: int = 16000) -> np.ndarray:
        """Speech probability per 10 ms frame, on device, bucketed."""
        audio = np.asarray(audio, np.float32)
        if sr != 16000:
            from ..ops.resample import resample_poly_np

            audio = resample_poly_np(audio, 16000, sr)
            sr = 16000
        top = _SAMPLE_LADDER.rungs[-1]
        if len(audio) > top:
            # audio beyond the top bucket: window at the top rung and
            # concatenate frame tracks (SURVEY.md §5.7 chunking)
            parts = [
                self.frame_probs(audio[i: i + top], sr)
                for i in range(0, len(audio), top)
            ]
            return np.concatenate(parts) if parts else np.zeros(0, np.float32)
        t = features.num_frames(len(audio), sr)
        if t == 0:
            return np.zeros(0, np.float32)
        bucket = _SAMPLE_LADDER.bucket(len(audio))
        padded = pad_to(audio, bucket)[None]
        from ..runtime.precision import quantize_i16

        probs = self._probs(self._params_c, jnp.asarray(quantize_i16(padded)),
                            jnp.array([t]))
        return np.asarray(probs[0, :t])

    def frame_probs_batch(self, clips: list, sr: int = 16000) -> list:
        """Frame probabilities for several clips in ONE device dispatch
        (all padded to the largest needed bucket)."""
        clips = [np.asarray(c, np.float32) for c in clips]
        if sr != 16000:
            from ..ops.resample import resample_poly_np

            clips = [resample_poly_np(c, 16000, sr) for c in clips]
        top = _SAMPLE_LADDER.rungs[-1]
        if not clips or any(len(c) > top for c in clips):
            return [self.frame_probs(c) for c in clips]
        ts = [features.num_frames(len(c)) for c in clips]
        if all(t == 0 for t in ts):
            return [np.zeros(0, np.float32) for _ in clips]
        bucket = _SAMPLE_LADDER.bucket(max(len(c) for c in clips))
        batch = np.stack([pad_to(c, bucket) for c in clips])
        from ..runtime.precision import quantize_i16

        probs = np.asarray(self._probs(
            self._params_c, jnp.asarray(quantize_i16(batch)),
            jnp.asarray([max(t, 1) for t in ts])))
        return [probs[i, :t] for i, t in enumerate(ts)]

    def vad_detection_batch(self, clips: list, sr: int = 16000,
                            cfg: VADConfig | None = None, **over) -> list:
        """vad_detection for several clips with one device dispatch —
        the single post-processing path for both single and batch APIs."""
        cfg = replace(cfg or VADConfig(), **over)
        out = []
        for clip, probs in zip(clips, self.frame_probs_batch(clips, sr)):
            segs = segment_probs(probs, cfg, fps=100.0)
            dur = len(clip) / sr
            segs = [[max(0.0, s), min(dur, e)] for s, e in segs]
            if cfg.min_clip_sec > 0:
                segs = merge_short_clips(segs, cfg.min_clip_sec)
            if cfg.max_clip_sec > 0:
                segs = split_long_clips(segs, cfg.max_clip_sec)
            out.append(segs)
        return out

    # ---------------- offline segmentation ----------------

    def vad_detection(
        self, audio: np.ndarray, sr: int = 16000, cfg: VADConfig | None = None, **over
    ) -> list:
        """[[start_s, end_s], ...] speech segments.

        Keyword overrides (e.g. max_end_silence_time=...) mirror the
        reference's per-call parameter pokes (ASRProcessor.py:762-764).
        """
        return self.vad_detection_batch([audio], sr=sr, cfg=cfg, **over)[0]

    def get_speech_timestamps(
        self, audio: np.ndarray, sr: int = 16000, return_seconds: bool = False, **over
    ) -> list:
        """silero-vad-shaped API: [{'start': .., 'end': ..}, ...]
        in samples (default) or seconds."""
        segs = self.vad_detection(audio, sr=sr, **over)
        if return_seconds:
            return [{"start": s, "end": e} for s, e in segs]
        return [{"start": int(s * sr), "end": int(e * sr)} for s, e in segs]

    def is_speech(self, audio: np.ndarray, sr: int = 16000, min_ratio: float = 0.1) -> bool:
        probs = self.frame_probs(audio, sr=sr)
        if probs.size == 0:
            return False
        return float(np.mean(probs > 0.5)) >= min_ratio


# ---------------- host-side state machine (pure) ----------------


def segment_probs(probs: np.ndarray, cfg: VADConfig, fps: float = 100.0) -> list:
    """Hysteresis segmentation of a frame-probability track → [[s, e], ...] s."""
    max_sil = int(round(cfg.max_end_silence_time * fps))
    min_speech = int(round(cfg.min_speech_duration * fps))
    pad = cfg.speech_pad
    segs = []
    in_speech = False
    start = 0
    sil_run = 0
    for i, p in enumerate(probs):
        if not in_speech:
            if p >= cfg.threshold_on:
                in_speech, start, sil_run = True, i, 0
        else:
            if p < cfg.threshold_off:
                sil_run += 1
                if sil_run > max_sil:
                    end = i - sil_run + 1
                    if end - start >= min_speech:
                        segs.append([start / fps - pad, end / fps + pad])
                    in_speech = False
            else:
                sil_run = 0
    if in_speech:
        end = len(probs) - sil_run
        if end - start >= min_speech:
            segs.append([start / fps - pad, end / fps + pad])
    # clamp + merge overlaps created by padding
    merged = []
    for s, e in segs:
        s = max(s, 0.0)
        if merged and s <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    return merged


def merge_short_clips(segs: list, min_clip_sec: float) -> list:
    """Merge clips shorter than min_clip_sec into the nearest neighbor
    (reference ASRProcessor.py:769-785 semantics)."""
    if not segs:
        return segs
    out = [list(segs[0])]
    for s, e in segs[1:]:
        if (e - s) < min_clip_sec or (out[-1][1] - out[-1][0]) < min_clip_sec:
            out[-1][1] = e
        else:
            out.append([s, e])
    return out


def split_long_clips(segs: list, max_clip_sec: float) -> list:
    """Split clips longer than max_clip_sec into equal parts
    (reference ASRProcessor.py:786-798 semantics)."""
    out = []
    for s, e in segs:
        dur = e - s
        if dur <= max_clip_sec:
            out.append([s, e])
            continue
        n = int(np.ceil(dur / max_clip_sec))
        step = dur / n
        out.extend([[s + i * step, s + (i + 1) * step] for i in range(n)])
    return out
