"""Diarization engines: sliding-window clustering + overlap segmentation.

TPU-native replacements for the two diarizers the reference composes
(SURVEY.md §2.5):

- modelscope CAM++ speaker-diarization pipeline (TargetDiarization.py:73-77,
  used for audio ≥30 s): VAD → sliding sub-windows → speaker embeddings →
  clustering → labeled segments. Here: `ClusterDiarizer`, built on our
  CAM++/ERes2NetV2 SpeakerEngine with one batched bucketed embedding
  forward for ALL windows (the reference loops per window).
- pyannote speaker-diarization-3.1 (TargetDiarization.py:84-87, used for
  short audio and overlap detection): frame-level multi-speaker activity
  model + clustering. Here: `SegmentationNet`, a conv + transformer
  frame-labeller with K speaker slots and sigmoid multilabel output —
  attention instead of pyannote's BiLSTM because static-shape attention
  maps onto the MXU (SURVEY.md §7.1 design stance).

Clustering runs host-side on tiny N (sklearn AHC/spectral), matching the
survey's host/device split (§7.1).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..runtime.buckets import BucketLadder, pad_to
from ..runtime.registry import register_model
from . import features
from ..pipeline import intervals as iv
from .vad import VADConfig, segment_probs


# ---------------- segmentation model (overlap + short-audio diarization) ----------------


class TransformerBlock(nn.Module):
    dim: int = 128
    heads: int = 4
    ff_mult: int = 4

    @nn.compact
    def __call__(self, x, mask):
        # x: (B, T, D); mask: (B, T)
        attn_mask = mask[:, None, None, :] > 0  # (B, 1, 1, T) key mask
        h = nn.LayerNorm()(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim, name="attn"
        )(h, h, mask=attn_mask)
        x = x + h
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.dim * self.ff_mult)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim)(h)
        return (x + h) * mask[..., None]


@register_model(name="SegmentationNet")
class SegmentationNet(nn.Module):
    """Frame-level speaker-activity model with `max_speakers` slots.

    fbank (B, T, 80) → strided conv stack (×4 time downsample, 40 ms
    frames) → transformer encoder → per-frame sigmoid activations
    (B, T//4, K). Overlap = ≥2 slots active; short-audio diarization =
    per-slot segments (slot identity is consistent within one window).
    """

    feat_dim: int = 80
    dim: int = 128
    n_layers: int = 2
    heads: int = 4
    max_speakers: int = 3
    downsample: int = 4

    @nn.compact
    def __call__(self, feats, lengths):
        b, t, f = feats.shape
        mask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(feats.dtype)
        x = feats * mask[..., None]
        x = nn.Conv(self.dim, (5,), strides=(2,), name="conv1")(x)
        x = nn.gelu(x)
        x = nn.Conv(self.dim, (5,), strides=(self.downsample // 2,), name="conv2")(x)
        x = nn.gelu(x)
        t2 = x.shape[1]
        m2 = (jnp.arange(t2)[None, :] < jnp.maximum(lengths // self.downsample, 1)[:, None]).astype(x.dtype)
        # sinusoidal positions
        pos = jnp.arange(t2)[:, None] / (
            10000.0 ** (jnp.arange(self.dim // 2)[None, :] * 2 / self.dim)
        )
        pe = jnp.concatenate([jnp.sin(pos), jnp.cos(pos)], axis=-1)
        x = x + pe[None]
        for i in range(self.n_layers):
            x = TransformerBlock(dim=self.dim, heads=self.heads, name=f"layer_{i}")(x, m2)
        logits = nn.Dense(self.max_speakers, name="head")(x)
        return jax.nn.sigmoid(logits) * m2[..., None]  # (B, T', K)


_SEG_LADDER = BucketLadder(tuple(int(s * 16000) for s in (1, 2, 4, 8, 16, 30)))


def activations_to_diarization(act: np.ndarray, fps: float,
                               cfg: "BinarizeConfig | None" = None) -> dict:
    """(T', K) activations → sd_result {slot: [(s, e), ...]} — the
    host half of SegmentationEngine.diarize, reusable on precomputed
    activations (fused-frontend path)."""
    cfg = cfg or BinarizeConfig()
    # pyannote Binarize order (pyannote.audio utils/signal.py semantics,
    # the reference's od_pipeline binarizer): (1) onset/offset hysteresis
    # ends a segment at the FIRST sub-offset frame, (2) pad boundaries,
    # (3) fill gaps shorter than min_duration_off — but only between
    # segments that each independently re-reached `onset`, (4) drop
    # segments shorter than min_duration_on. Folding min_duration_off
    # into the VAD machine's max_end_silence_time instead (as rounds 1-3
    # did) cannot distinguish a mid-utterance confidence dip (recovers
    # above onset → merge) from a true segment end followed by weak
    # sub-onset activity (must NOT merge): both look like an
    # equally-long sub-offset run. Calibrated on the reference's own
    # chat_mix output, where the two cases co-occur ~2 s apart.
    vcfg = VADConfig(
        threshold_on=cfg.onset,
        threshold_off=cfg.offset,
        max_end_silence_time=0.0,
        min_speech_duration=0.0,
        speech_pad=0.0,  # asymmetric pads applied below
    )
    pad_on = cfg.pad_onset if cfg.pad_onset is not None else cfg.speech_pad
    pad_off = (cfg.pad_offset if cfg.pad_offset is not None
               else cfg.speech_pad)
    result = {}
    bt = cfg.onset_backtrack
    bt_max = int(round(cfg.backtrack_max * fps))
    for k in range(act.shape[1]):
        track = act[:, k]
        segs = segment_probs(track, vcfg, fps=fps)
        # (2) asymmetric boundary padding (pyannote pad_onset/pad_offset)
        for seg in segs:
            seg[0] = max(seg[0] - pad_on, 0.0)
            seg[1] = seg[1] + pad_off
        # merge overlaps the padding may have created
        merged = []
        for s, e in segs:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        segs = merged
        # (1b) onset back-extension: a slot joining over an already-
        # active voice ramps slowly (the fixture's overlap onset is
        # detected ~0.22 s late at threshold 0.5, the dominant no-collar
        # DER term). Globally lowering `onset` sprays spurious segments
        # (sweep: DER 0.029 → 0.17-0.30); instead, walk each CONFIRMED
        # segment's start backward while the activation stays above the
        # lower `onset_backtrack` level — recovers the ramp without
        # creating segments. Only existing onsets move, only earlier.
        if bt > 0.0 and bt_max > 0:
            prev_end_f = -1
            for seg in segs:
                f_on = int(round((seg[0] + pad_on) * fps))
                f_on = min(max(f_on, 0), len(track) - 1)
                f_new = f_on
                while (f_new - 1 > prev_end_f and f_on - f_new < bt_max
                       and f_new - 1 >= 0 and track[f_new - 1] >= bt):
                    f_new -= 1
                if f_new < f_on:
                    seg[0] = max(f_new / fps - pad_on, 0.0)
                prev_end_f = int(round((seg[1] - pad_off) * fps))
        # (3) fill short gaps between onset-confirmed segments
        filled = []
        for s, e in segs:
            if filled and s - filled[-1][1] < cfg.min_duration_off:
                filled[-1][1] = e
            else:
                filled.append([s, e])
        # (4) minimum duration
        segs = [(s, e) for s, e in filled if e - s >= cfg.min_duration_on]
        if segs:
            result[str(k)] = [(round(s, 3), round(e, 3)) for s, e in segs]
    return result


@dataclass
class BinarizeConfig:
    onset: float = 0.5
    offset: float = 0.35
    min_duration_on: float = 0.2
    # gap-merge horizon (pyannote Binarize min_duration_off). Calibrated
    # against the reference system's own chat_mix output: the seg net's
    # confidence dips below `offset` for ~0.32 s mid-utterance around
    # 7.8-8.0 s, which split one continuous reference segment
    # ([5.077, 8.62]) in two and was the dominant DER term (0.020 →
    # 0.000 with the gap merged). 0.45 closes sub-half-second dips while
    # staying well under the reference's inter-segment silences.
    min_duration_off: float = 0.45
    # outward boundary padding (pyannote Binarize pad_onset/pad_offset):
    # the onset threshold systematically trims the attack of the first
    # phoneme — measured ~0.04-0.12 s late starts on the fixture, which
    # cost the first character of short ASR segments. `speech_pad` is
    # the symmetric default; pad_onset/pad_offset override per side
    # (the offset side systematically overshoots the true end by
    # ~0.04 s on the fixture, a pure false-alarm term at collar 0)
    # Calibrated at collar 0 against the reference's own chat_mix
    # output (examples/calibrate_binarize.py): the onset side lags
    # structurally (40 ms seg frames + transformer smoothing — every
    # onset fires late, the overlap onset worst), the offset side
    # overshoots ~0.04 s. 0.14/0.06 took no-collar pipeline DER
    # 0.0294 → 0.0176 with collar-0.25 staying 0.000.
    speech_pad: float = 0.1
    pad_onset: float | None = 0.14
    pad_offset: float | None = 0.06
    # onset back-extension (see activations_to_diarization step 1b):
    # confirmed onsets walk backward while the activation stays above
    # this level, up to backtrack_max seconds. 0.0 disables. Calibrated
    # per examples/calibrate_binarize.py --backtrack on the fixture:
    # every bt in [0.2, 0.35] recovers the same 0.04 s of the late
    # overlap onset (collar-0 DER 0.0294 → 0.0260) with collar-0.25
    # staying 0.000; 0.2/0.25 is the least aggressive such setting.
    onset_backtrack: float = 0.2
    backtrack_max: float = 0.25


class SegmentationEngine:
    """pyannote-equivalent: activations, per-slot diarization, overlap."""

    def __init__(self, params=None, model: SegmentationNet | None = None, seed: int = 0,
                 compute_dtype: str | None = None):
        self.model = model or SegmentationNet()
        if params is None:
            params = self.model.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, 100, self.model.feat_dim)),
                jnp.array([100]),
            )
        self.params = params
        from ..runtime.precision import resolve_compute_dtype, cast_params, cast_inputs, f32

        self.compute_dtype = resolve_compute_dtype(compute_dtype)
        self._params_c = cast_params(params, self.compute_dtype)

        def _fwd(p, audio, n_frames):
            from ..runtime.precision import dequantize_audio

            audio = dequantize_audio(audio)  # int16 upload path
            feats = features.fbank(audio)  # fused into the one dispatch
            (feats_c,) = cast_inputs(self.compute_dtype, feats)
            return f32(self.model.apply(p, feats_c, n_frames))

        self._apply = jax.jit(_fwd)

    @classmethod
    def from_pretrained(cls, path: str) -> "SegmentationEngine":
        from ..runtime.registry import from_pretrained

        model, params = from_pretrained(path)
        return cls(params=params, model=model)

    @property
    def fps(self) -> float:
        return 100.0 / self.model.downsample

    def activations(self, audio: np.ndarray, sr: int = 16000) -> np.ndarray:
        """(T', K) per-slot speech activity in [0,1] at `self.fps`."""
        audio = np.asarray(audio, np.float32)
        if sr != 16000:
            from ..ops.resample import resample_poly_np

            audio = resample_poly_np(audio, 16000, sr)
            sr = 16000
        top = _SEG_LADDER.rungs[-1]
        if len(audio) > top:
            parts = [
                self.activations(audio[i: i + top], sr)
                for i in range(0, len(audio), top)
            ]
            return (np.concatenate(parts, axis=0) if parts
                    else np.zeros((0, self.model.max_speakers), np.float32))
        t = features.num_frames(len(audio), sr)
        if t == 0:
            return np.zeros((0, self.model.max_speakers), np.float32)
        bucket = _SEG_LADDER.bucket(len(audio))
        padded = pad_to(audio, bucket)[None]
        from ..runtime.precision import quantize_i16

        act = self._apply(self._params_c, jnp.asarray(quantize_i16(padded)),
                          jnp.array([t]))
        t_out = max(t // self.model.downsample, 1)
        return np.asarray(act[0, :t_out])

    def diarize(self, audio: np.ndarray, sr: int = 16000,
                cfg: BinarizeConfig | None = None) -> dict:
        """sd_result {slot: [(s,e), ...]} from one window (audio ≤30 s)."""
        act = self.activations(audio, sr=sr)
        return activations_to_diarization(act, self.fps, cfg)

    def detect_overlap(self, audio: np.ndarray, sr: int = 16000,
                       min_overlap_sec: float = 0.4) -> dict:
        """od_result {'a-b': [(s,e)...]} of pairwise overlapping speech."""
        return iv.get_speaker_overlap(
            self.diarize(audio, sr=sr), min_overlap_sec=min_overlap_sec
        )

    def is_overlap(self, audio: np.ndarray, sr: int = 16000) -> bool:
        """Streaming helper: any two slots simultaneously active
        (reference TargetDiarizationStream.py:175-179)."""
        return bool(self.detect_overlap(audio, sr=sr))


# ---------------- sliding-window cluster diarizer (CAM++ pipeline) ----------------


@dataclass
class DiarizeConfig:
    window: float = 1.5  # s, embedding sub-window
    hop: float = 0.75
    min_window: float = 0.5  # drop shorter tails
    clustering_threshold: float = 0.6  # cosine distance for AHC
    min_segment: float = 0.3


class ClusterDiarizer:
    """VAD → sliding windows → batched embeddings → AHC/spectral cluster.

    Output format matches the reference's parsed CAM++ result
    ({'0': [(s,e)...], ...}, labels as stringified ints ordered by first
    appearance — TargetDiarization.py:185-225).
    """

    def __init__(self, speaker_engine, vad_engine=None, cfg: DiarizeConfig | None = None):
        self.spk = speaker_engine
        self.vad = vad_engine
        self.cfg = cfg or DiarizeConfig()

    def _windows(self, speech_segs: list, duration: float) -> list:
        win, hop = self.cfg.window, self.cfg.hop
        out = []
        for s, e in speech_segs:
            t = s
            while t < e:
                w_end = min(t + win, e)
                if w_end - t >= self.cfg.min_window or not out:
                    out.append((t, w_end))
                t += hop
                if w_end >= e:
                    break
        return out

    def _cluster(self, embs: np.ndarray, n_speakers: int | None) -> np.ndarray:
        from sklearn.cluster import AgglomerativeClustering

        if len(embs) == 1:
            return np.zeros(1, np.int64)
        norm = embs / np.maximum(np.linalg.norm(embs, axis=1, keepdims=True), 1e-9)
        if n_speakers is not None and n_speakers >= 1:
            n = min(n_speakers, len(embs))
            model = AgglomerativeClustering(n_clusters=n, metric="cosine", linkage="average")
        else:
            model = AgglomerativeClustering(
                n_clusters=None,
                distance_threshold=self.cfg.clustering_threshold,
                metric="cosine",
                linkage="average",
            )
        return model.fit_predict(norm)

    def diarize(self, audio: np.ndarray, sr: int = 16000,
                n_speakers: int | None = None) -> dict:
        audio = np.asarray(audio, np.float32)
        duration = len(audio) / sr
        if self.vad is not None:
            speech = self.vad.vad_detection(audio, sr=sr)
        else:
            speech = [[0.0, duration]]
        if not speech:
            return {}
        wins = self._windows(speech, duration)
        if not wins:
            return {}
        clips = [audio[int(s * sr): int(e * sr)] for s, e in wins]
        embs = self.spk.embed_batch(clips, sr=sr)
        return self.diarize_from_windows(wins, embs, n_speakers)

    def diarize_from_windows(self, wins: list, embs: np.ndarray,
                             n_speakers: int | None = None) -> dict:
        """Cluster precomputed (window, embedding) pairs → sd_result.
        Used both by diarize() and by the fused-frontend path, which
        computes sliding embeddings inside the analyze program."""
        valid = np.linalg.norm(embs, axis=1) > 0
        wins = [w for w, v in zip(wins, valid) if v]
        embs = np.asarray(embs)[valid]
        if len(embs) == 0:
            return {}
        labels = self._cluster(embs, n_speakers)
        # window labels → segments: split at label changes, boundaries at
        # window midpoints; relabel by first appearance to '0','1',...
        segments = []
        cur_label, cur_start, cur_end = None, None, None
        for (s, e), lab in zip(wins, labels):
            if lab == cur_label and s <= cur_end:
                cur_end = e
            else:
                if cur_label is not None:
                    boundary = min(cur_end, s + (cur_end - s) / 2) if s < cur_end else cur_end
                    segments.append([cur_start, boundary, cur_label])
                    cur_start = boundary if s < boundary else s
                else:
                    cur_start = s
                cur_label, cur_end = lab, e
        if cur_label is not None:
            segments.append([cur_start, cur_end, cur_label])
        remap: dict = {}
        for seg in segments:
            seg[2] = remap.setdefault(seg[2], len(remap))
        segments = [s for s in segments if (s[1] - s[0]) >= self.cfg.min_segment]
        return iv.parse_segments(segments)
