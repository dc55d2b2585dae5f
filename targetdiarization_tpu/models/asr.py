"""ASR models: Paraformer (SAN-M + CIF, char timestamps) and SenseVoice.

TPU-native replacements for the FunASR engines the reference drives
through ASRProcessor (ASRProcessor.py:210-252, asr_detection :373-528):

- **Paraformer**: non-autoregressive encoder-predictor-decoder.
  Encoder = SAN-M blocks (self-attention + a depthwise FSMN memory
  branch on the values, the FunASR "memory-equipped self-attention");
  predictor = CIF (continuous integrate-and-fire) producing one
  acoustic embedding per output token plus its fire frame — which is
  exactly what yields the per-char `timestamp` list the reference
  slices segments with (TargetDiarization.py:804-818, SURVEY.md §7.4.1);
  decoder = bidirectional SAN-M blocks with cross-attention, one
  parallel (non-autoregressive) pass, greedy argmax.
- **SenseVoice**: encoder-only CTC with language/event/emotion tag
  tokens prepended to the frame sequence (rich transcription tags the
  reference strips by regex, ASRProcessor.py:395-396).

TPU design notes: the whole forward is static-shape — raw audio is
bucketed on a sample ladder and fbank+LFR+CMVN run INSIDE the one jitted
program per bucket (one device dispatch per utterance), decoding happens
on device (argmax before transfer), and CIF uses a parallel closed form
(one matmul) instead of a sequential scan — see cif_fire.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.dwconv import DepthwiseConv1d
from ..runtime.buckets import BucketLadder, pad_to
from ..runtime.registry import register_model
from . import features
from .tokenizer import CharTokenizer

LFR_M, LFR_N = 7, 6
FRAME_MS = 10.0 * LFR_N  # 60 ms per LFR frame


# ---------------- SAN-M blocks ----------------


class SANMAttention(nn.Module):
    """Multi-head self-attention + depthwise FSMN memory on values."""

    dim: int
    heads: int = 4
    fsmn_kernel: int = 11

    @nn.compact
    def __call__(self, x, mask, context=None):
        # x: (B, T, D); mask: (B, T); context: cross-attention source
        src = x if context is None else context
        src_mask = mask if context is None else jnp.ones(src.shape[:2], x.dtype)
        hd = self.dim // self.heads
        q = nn.Dense(self.dim, name="q")(x)
        k = nn.Dense(self.dim, name="k")(src)
        v = nn.Dense(self.dim, name="v")(src)

        b, t, _ = x.shape
        s = src.shape[1]
        qh = q.reshape(b, t, self.heads, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(b, s, self.heads, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(b, s, self.heads, hd).transpose(0, 2, 1, 3)
        att = jnp.einsum("bhtd,bhsd->bhts", qh, kh) / np.sqrt(hd)
        att = jnp.where(src_mask[:, None, None, :] > 0, att, -1e9)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhts,bhsd->bhtd", att, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.dim)

        # FSMN memory branch over the value path (self-attention only)
        if context is None:
            mem = DepthwiseConv1d(
                features=self.dim, kernel_size=self.fsmn_kernel, name="fsmn",
            )(v * mask[..., None])
            out = out + mem
        return nn.Dense(self.dim, name="out")(out)


class SANMBlock(nn.Module):
    dim: int
    heads: int = 4
    ffn: int = 2048
    cross: bool = False

    @nn.compact
    def __call__(self, x, mask, context=None):
        h = nn.LayerNorm(name="ln1")(x)
        x = x + SANMAttention(self.dim, self.heads, name="attn")(h, mask)
        if self.cross and context is not None:
            h = nn.LayerNorm(name="ln_cross")(x)
            x = x + SANMAttention(self.dim, self.heads, name="cross_attn")(
                h, mask, context=context
            )
        h = nn.LayerNorm(name="ln2")(x)
        h = nn.Dense(self.ffn, name="ff1")(h)
        h = jax.nn.relu(h)
        h = nn.Dense(self.dim, name="ff2")(h)
        return (x + h) * mask[..., None]


class _SANMScanBody(nn.Module):
    """nn.scan body: one SANMBlock applied to the carry.

    Deep towers compile as ONE scanned layer body instead of N unrolled
    copies — a 50-layer encoder's XLA program shrinks ~50× and so does
    its compile time (the round-3 cold-start bottleneck). Params carry a
    leading layer axis; runtime/params.py::upgrade_scan_layout stacks
    legacy per-layer checkpoints on load."""

    dim: int
    heads: int
    ffn: int
    cross: bool = False

    @nn.compact
    def __call__(self, x, mask, context=None):
        x = SANMBlock(self.dim, self.heads, self.ffn, cross=self.cross,
                      name="block")(x, mask, context=context)
        return x, None


def _sanm_stack(n_layers: int, cross: bool = False):
    # unroll=2 amortizes the scan loop-boundary overhead (carry layout
    # round-trips) across two bodies — same trade measured for the
    # MossFormer2 tower (separation.py MaskNet: −30% device time)
    return nn.scan(
        _SANMScanBody,
        variable_axes={"params": 0},
        split_rngs={"params": True},
        length=n_layers,
        in_axes=(nn.broadcast, nn.broadcast),
        unroll=2 if n_layers % 2 == 0 else 1,
    )


class SANMEncoder(nn.Module):
    dim: int = 512
    heads: int = 4
    ffn: int = 2048
    n_layers: int = 12
    in_dim: int = 80 * LFR_M

    @nn.compact
    def __call__(self, feats, mask):
        x = nn.Dense(self.dim, name="in_proj")(feats)
        x = x * (self.dim ** 0.5)
        # sinusoidal positions
        t = x.shape[1]
        inv = 1.0 / (10000.0 ** (jnp.arange(0, self.dim, 2) / self.dim))
        ang = jnp.arange(t)[:, None] * inv[None, :]
        x = x + jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)[None]
        x = x * mask[..., None]
        x, _ = _sanm_stack(self.n_layers)(
            self.dim, self.heads, self.ffn, name="blocks")(x, mask, None)
        return nn.LayerNorm(name="out_ln")(x) * mask[..., None]


# ---------------- CIF predictor ----------------


class CIFPredictor(nn.Module):
    """Continuous integrate-and-fire: frame weights → token embeddings.

    Returns (tokens (B, U, D), fires (B, T) bool, alphas (B, T)).
    U (max tokens) is a static fraction of T.
    """

    dim: int = 512
    threshold: float = 1.0
    # inference-time tail handling (funasr cif_predictor semantics): a
    # virtual zero-hidden frame carrying `tail_threshold` of alpha mass
    # is appended at speech end, so a final character whose accumulated
    # weight lands short of the fire threshold (residue > 1 − tail) is
    # still emitted instead of silently dropped. Measured: the final
    # char of short utterances was lost in ~40% of pipeline transcripts
    # before this.
    tail_threshold: float = 0.45

    @nn.compact
    def __call__(self, enc, mask, target_len=None):
        h = nn.Conv(self.dim, (3,), padding="SAME", name="conv")(enc)
        h = jax.nn.relu(h)
        alphas = jax.nn.sigmoid(nn.Dense(1, name="alpha")(h))[..., 0]  # (B, T)
        alphas = alphas * mask
        alphas_raw = alphas  # pre-scaling: the quantity-loss target
        if target_len is not None:
            # training-time scaling so sum(alphas) == target token count
            total = jnp.maximum(jnp.sum(alphas, axis=1, keepdims=True), 1e-6)
            alphas = alphas / total * target_len[:, None]
        # CIF integration runs in fp32 regardless of compute dtype: the
        # threshold-crossing accumulator is precision-sensitive (bf16
        # epsilons shift fire positions and change token counts)
        enc_f = enc.astype(jnp.float32)
        alphas_f = alphas.astype(jnp.float32)
        if target_len is None and self.tail_threshold > 0:
            b, t = alphas.shape
            valid = jnp.sum(mask, axis=1).astype(jnp.int32)  # (B,)
            # tail mass at the first frame past the valid region (the
            # padded alphas there are zero, so the crossing happens at
            # exactly speech end)
            ext = jax.nn.one_hot(valid, t + 1,
                                 dtype=jnp.float32) * self.tail_threshold
            alphas_f = jnp.pad(alphas_f, ((0, 0), (0, 1))) + ext
            enc_f = jnp.pad(enc_f, ((0, 0), (0, 1), (0, 0)))
            tokens, fires, fire_frames, n_tokens = cif_fire(
                enc_f, alphas_f, self.threshold)
            # drop the virtual frame/slot; a tail fire lands on the
            # last valid frame for timestamp purposes
            last_valid = jnp.maximum(valid - 1, 0)[:, None]
            fire_frames = jnp.where(
                fire_frames >= 0,
                jnp.minimum(fire_frames, last_valid), -1)
            tokens, fires, fire_frames = (
                tokens[:, :t], fires[:, :t], fire_frames[:, :t])
        else:
            tokens, fires, fire_frames, n_tokens = cif_fire(
                enc_f, alphas_f, self.threshold)
        tokens = tokens.astype(enc.dtype)
        return tokens, fires, alphas, fire_frames, n_tokens, alphas_raw


def cif_fire(hidden: jnp.ndarray, alphas: jnp.ndarray, threshold: float = 1.0):
    """CIF integration, PARALLEL closed form.

    The textbook CIF is a sequential accumulate-and-fire loop; as a
    lax.scan it costs T sequential TPU steps (~0.5 ms each — the scan
    dominated ASR latency). But each fire subtracts exactly `threshold`,
    so with c[j] = cumsum(alphas)[j], token k integrates precisely the
    alpha mass of the interval [k·thr, (k+1)·thr) on the cumulative axis:

        w[k, j] = clip(min(c[j], (k+1)·thr) − max(c[j−1], k·thr), 0)
        token_k = Σ_j (w[k, j] / thr) · h_j
        fire_frame_k = first j with c[j] ≥ (k+1)·thr

    which is one (U×T)·(T×D) matmul on the MXU plus elementwise work —
    fully parallel, bit-equivalent to the scan (tested side by side).

    hidden: (B, T, D), alphas: (B, T) ≥0. Returns:
      tokens      (B, U, D) padded acoustic token embeddings (U = T)
      fires       (B, T) bool fire mask
      fire_frames (B, U) frame index where each token fired (-1 padding)
      n_tokens    (B,) token counts
    """
    b, t, d = hidden.shape
    csum = jnp.cumsum(alphas, axis=1)  # (B, T)
    prev = csum - alphas
    k = jnp.arange(t, dtype=csum.dtype)  # token slots (U = T)
    lo = k[None, :, None] * threshold  # (1, U, 1)
    hi = lo + threshold
    # overlap of [prev_j, csum_j] with [k·thr, (k+1)·thr)
    w = jnp.clip(
        jnp.minimum(csum[:, None, :], hi) - jnp.maximum(prev[:, None, :], lo),
        0.0,
    )  # (B, U, T)
    tokens = jnp.einsum("but,btd->bud", w / threshold, hidden)
    n_tokens = jnp.floor(csum[:, -1] / threshold + 1e-6).astype(jnp.int32)
    # fire mask / frames: fire at j iff c[j] crosses a new multiple of thr
    fires = jnp.floor(csum / threshold + 1e-6) > jnp.floor(
        prev / threshold + 1e-6)
    # first frame where csum ≥ (k+1)·thr
    crossed = (csum[:, None, :] >= hi - 1e-6).astype(jnp.int32)  # (B, U, T)
    fire_frames = t - jnp.sum(crossed, axis=-1)  # index of first crossing
    valid = k[None, :] < n_tokens[:, None]
    fire_frames = jnp.where(valid, fire_frames, -1).astype(jnp.int32)
    tokens = jnp.where(valid[..., None], tokens, 0.0)
    return tokens, fires, fire_frames, n_tokens


# ---------------- models ----------------


@register_model(name="Paraformer")
class Paraformer(nn.Module):
    """Non-autoregressive encoder–CIF–decoder ASR (paraformer-large
    geometry by default: 512/4/2048, 50 enc + 16 dec blocks ≈ 220 M)."""

    vocab_size: int = 21001  # len(default_vocab())  # len(default_vocab())
    dim: int = 512
    heads: int = 4
    ffn: int = 2048
    enc_layers: int = 50
    dec_layers: int = 16

    @nn.compact
    def __call__(self, feats, mask, target_len=None):
        enc = SANMEncoder(
            self.dim, self.heads, self.ffn, self.enc_layers, name="encoder"
        )(feats, mask)
        tokens, fires, alphas, fire_frames, n_tokens, alphas_raw = CIFPredictor(
            self.dim, name="predictor"
        )(enc, mask, target_len)
        u = tokens.shape[1]
        tok_mask = (jnp.arange(u)[None, :] < n_tokens[:, None]).astype(feats.dtype)
        x, _ = _sanm_stack(self.dec_layers, cross=True)(
            self.dim, self.heads, self.ffn, cross=True,
            name="decoder_blocks")(tokens, tok_mask, enc)
        x = nn.LayerNorm(name="dec_ln")(x)
        logits = nn.Dense(self.vocab_size, name="vocab_proj")(x)
        return {
            "logits": logits,  # (B, U, V)
            "n_tokens": n_tokens,  # (B,)
            "fire_frames": fire_frames,  # (B, U)
            "alphas": alphas,  # (B, T) post-scaling (CIF input)
            "alphas_raw": alphas_raw,  # (B, T) pre-scaling (quantity loss)
            "encoder_out": enc,
        }


@register_model(name="SenseVoice")
class SenseVoice(nn.Module):
    """Encoder-only CTC ASR with rich-tag prefix (language, emotion,
    event) — 4 learned query tokens prepended to the frame sequence."""

    vocab_size: int = 21001  # len(default_vocab())
    dim: int = 512
    heads: int = 4
    ffn: int = 2048
    enc_layers: int = 50
    n_lang: int = 8
    n_emotion: int = 8
    n_event: int = 8

    @nn.compact
    def __call__(self, feats, mask):
        b = feats.shape[0]
        prefix = self.param(
            "tag_queries", nn.initializers.normal(0.02), (4, 80 * LFR_M)
        )
        feats = jnp.concatenate(
            [jnp.broadcast_to(prefix[None], (b, 4, feats.shape[-1])), feats], axis=1
        )
        mask = jnp.concatenate([jnp.ones((b, 4), mask.dtype), mask], axis=1)
        enc = SANMEncoder(
            self.dim, self.heads, self.ffn, self.enc_layers, name="encoder"
        )(feats, mask)
        tag_out, frames = enc[:, :4], enc[:, 4:]
        ctc_logits = nn.Dense(self.vocab_size, name="ctc")(frames)
        lang = nn.Dense(self.n_lang, name="lang_head")(tag_out[:, 0])
        emotion = nn.Dense(self.n_emotion, name="emotion_head")(tag_out[:, 1])
        event = nn.Dense(self.n_event, name="event_head")(tag_out[:, 2])
        return {
            "ctc_logits": ctc_logits,
            "lang_logits": lang,
            "emotion_logits": emotion,
            "event_logits": event,
        }


LANGS = ["zh", "en", "yue", "ja", "ko", "nospeech", "auto", "other"]
EMOTIONS = ["NEUTRAL", "HAPPY", "ANGRY", "SAD", "FEARFUL", "DISGUSTED", "SURPRISED", "UNKNOWN"]
EVENTS = ["Speech", "BGM", "Applause", "Laughter", "Cough", "Sneeze", "Breath", "Cry"]


# ---------------- engine ----------------

_SAMPLE_LADDER = BucketLadder(
    tuple(int(s * 16000) for s in (1, 2, 4, 8, 16, 30, 60))
)


def ctc_greedy(ids: np.ndarray, blank_id: int) -> list:
    """Collapse repeats then remove blanks."""
    out = []
    prev = -1
    for i in ids:
        i = int(i)
        if i != prev and i != blank_id:
            out.append(i)
        prev = i
    return out


@dataclass
class ASRResult:
    text: str
    timestamp: list  # [[start_ms, end_ms], ...] per char (paraformer)
    raw_text: str = ""
    language: str = ""
    emotion: str = ""
    event: str = ""

    def to_dict(self) -> dict:
        d = {"text": self.text, "timestamp": self.timestamp}
        if self.raw_text:
            d["raw_text"] = self.raw_text
        if self.language:
            d["language"] = self.language
        if self.emotion:
            d["emotion"] = self.emotion
        if self.event:
            d["event"] = self.event
        return d


class ASREngine:
    """Bucketed jitted ASR with the reference's result contract."""

    def __init__(self, params=None, model=None, tokenizer: CharTokenizer | None = None,
                 engine: str = "paraformer", seed: int = 0, cmvn=None,
                 compute_dtype: str | None = None):
        self.tokenizer = tokenizer or CharTokenizer()
        if model is None:
            if engine == "sensevoice":
                model = SenseVoice(vocab_size=len(self.tokenizer), enc_layers=8)
            else:
                model = Paraformer(
                    vocab_size=len(self.tokenizer), enc_layers=8, dec_layers=4
                )
        self.model = model
        self.engine = "sensevoice" if isinstance(model, SenseVoice) else "paraformer"
        self.cmvn = cmvn  # (mean, istd) over LFR features or None
        if params is None:
            print("WARNING: ASREngine initialized with RANDOM weights — "
                  "transcripts will be garbage. Train or load a checkpoint "
                  "(e.g. train.recipes.bootstrap_asr → checkpoints/"
                  "asr-bootstrap).")
            t0 = 16
            params = self.model.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, t0, 80 * LFR_M)),
                jnp.ones((1, t0)),
            )
        self.params = params
        from ..runtime.precision import resolve_compute_dtype, cast_params, cast_inputs, f32

        self.compute_dtype = resolve_compute_dtype(compute_dtype)
        self._params_c = cast_params(params, self.compute_dtype)

        def _fwd(p, audio, n_frames):
            # ONE device dispatch per utterance: fbank + LFR + CMVN and
            # the model forward run inside a single jitted program (each
            # extra dispatch costs a host-link round trip), and decoding
            # happens ON DEVICE — transferring (U, vocab≈21k) logits over
            # the host link costs ~20 MB ≈ 450 ms per call. Audio crosses
            # the link as int16 (half the bytes of f32).
            if audio.dtype == jnp.int16:
                audio = audio.astype(jnp.float32) / 32768.0
            feats = features.fbank(audio)
            feats = features.lfr(feats, LFR_M, LFR_N)
            if self.cmvn is not None:
                feats = features.apply_cmvn(
                    feats, jnp.asarray(self.cmvn[0]), jnp.asarray(self.cmvn[1]))
            t = feats.shape[1]
            mask = (jnp.arange(t)[None, :] < n_frames[:, None]).astype(jnp.float32)
            feats_c, mask_c = cast_inputs(self.compute_dtype, feats, mask)
            out = self.model.apply(p, feats_c, mask_c)
            if "ctc_logits" in out:
                return {
                    "ctc_ids": jnp.argmax(out["ctc_logits"], axis=-1),
                    "lang_id": jnp.argmax(out["lang_logits"], axis=-1),
                    "emotion_id": jnp.argmax(out["emotion_logits"], axis=-1),
                    "event_id": jnp.argmax(out["event_logits"], axis=-1),
                }
            return {
                "ids": jnp.argmax(out["logits"], axis=-1),
                "n_tokens": out["n_tokens"],
                "fire_frames": out["fire_frames"],
            }

        self._apply = jax.jit(_fwd)

        def _align(p, audio, n_frames, target_len):
            # forced alignment: CIF with the alpha mass scaled to exactly
            # target_len tokens — fire positions depend only on the
            # acoustics, so this aligns ARBITRARY text of known length
            # (the dedicated fa-zh timestamp model's role,
            # reference ASRProcessor.py:900-933)
            if audio.dtype == jnp.int16:
                audio = audio.astype(jnp.float32) / 32768.0
            feats = features.fbank(audio)
            feats = features.lfr(feats, LFR_M, LFR_N)
            if self.cmvn is not None:
                feats = features.apply_cmvn(
                    feats, jnp.asarray(self.cmvn[0]), jnp.asarray(self.cmvn[1]))
            t = feats.shape[1]
            mask = (jnp.arange(t)[None, :] < n_frames[:, None]).astype(jnp.float32)
            feats_c, mask_c = cast_inputs(self.compute_dtype, feats, mask)
            out = self.model.apply(p, feats_c, mask_c,
                                   target_len=target_len.astype(jnp.float32))
            return out["fire_frames"]

        self._align = jax.jit(_align) if self.engine == "paraformer" else None
        from ..runtime import microbatch

        # cross-session micro-batching: N serving threads' single-row
        # asr_detection dispatches sharing a sample bucket coalesce into
        # one batched program (runtime/microbatch.py) — streaming flush
        # chunks run one ASR per session
        self._mb = (microbatch.MicroBatcher(self._run_mb)
                    if microbatch.enabled() else None)

    # row rungs for coalesced single-utterance dispatches
    ROW_LADDER = (1, 2, 4, 8)

    def _run_mb(self, key, items) -> list:
        """MicroBatcher callback: stack concurrent (audio_i16_row, t)
        items sharing a sample bucket into one padded-row dispatch."""
        import bisect

        nb = self.ROW_LADDER[min(bisect.bisect_left(
            self.ROW_LADDER, len(items)), len(self.ROW_LADDER) - 1)]
        nb = max(nb, len(items))
        batch = np.zeros((nb, key), np.int16)
        ts = np.ones(nb, np.int32)
        for i, (row, t) in enumerate(items):
            batch[i] = row
            ts[i] = t
        out = jax.device_get(self._apply(
            self._params_c, jnp.asarray(batch), jnp.asarray(ts)))
        return [self._decode_row(out, i, t)
                for i, (_, t) in enumerate(items)]

    @classmethod
    def from_pretrained(cls, path: str) -> "ASREngine":
        import os

        from ..runtime.registry import from_pretrained

        model, params = from_pretrained(path)
        vocab_file = os.path.join(path, "vocab.txt")
        tok = CharTokenizer(vocab_file=vocab_file)
        cmvn = None
        cmvn_file = os.path.join(path, "cmvn.npz")
        if os.path.exists(cmvn_file):  # FunASR am.mvn slot
            with np.load(cmvn_file) as z:
                cmvn = (z["mean"], z["istd"])
        return cls(params=params, model=model, tokenizer=tok, cmvn=cmvn)

    def asr_detection_batch(self, audios: list, sr: int = 16000, **kw) -> list:
        """asr_detection over several utterances with one device dispatch
        per bucket (same contract per item, in order)."""
        audios = [np.asarray(a, np.float32) for a in audios]
        if sr != 16000:
            from ..ops.resample import resample_poly_np

            audios = [resample_poly_np(a, 16000, sr) for a in audios]
            sr = 16000
        top = _SAMPLE_LADDER.rungs[-1]
        results: list = [None] * len(audios)
        by_bucket: dict = {}
        for i, a in enumerate(audios):
            if len(a) > top or features.num_frames(len(a), sr) == 0:
                results[i] = self.asr_detection(a, sr, **kw)[0]
            else:
                by_bucket.setdefault(_SAMPLE_LADDER.bucket(len(a)), []).append(i)
        for bucket, idxs in by_bucket.items():
            batch = np.stack([pad_to(audios[i], bucket) for i in idxs])
            ts = [
                -(-features.num_frames(len(audios[i]), sr) // LFR_N)
                for i in idxs
            ]
            from ..runtime.precision import quantize_i16

            out = jax.device_get(self._apply(
                self._params_c, jnp.asarray(quantize_i16(batch)),
                jnp.asarray(ts)))
            for row, i in enumerate(idxs):
                results[i] = self._decode_row(out, row, ts[row])
        return results

    def _decode_row(self, out: dict, row: int, t: int) -> dict:
        """Decode one batch row of a device output dict to the result
        contract."""
        if self.engine == "sensevoice":
            ids = out["ctc_ids"][row, :t]
            toks = ctc_greedy(ids, self.tokenizer.blank_id)
            text = self.tokenizer.decode(toks)
            lang = LANGS[int(out["lang_id"][row])]
            emo = EMOTIONS[int(out["emotion_id"][row])]
            ev = EVENTS[int(out["event_id"][row])]
            return ASRResult(
                text=text, timestamp=[], raw_text=f"<|{lang}|><|{emo}|><|{ev}|>{text}",
                language=lang, emotion=emo, event=ev).to_dict()
        n_tok = int(out["n_tokens"][row])
        fire_frames = out["fire_frames"][row, :n_tok]
        ids = out["ids"][row, :n_tok] if n_tok else np.zeros(0, np.int64)
        text = self.tokenizer.decode(ids)
        ts_list = fire_frames_to_timestamps(fire_frames, t)
        keep = [
            i for i, tid in enumerate(ids)
            if self.tokenizer.vocab[int(tid)] not in ("<blank>", "<s>", "</s>")
        ]
        ts_list = [ts_list[i] for i in keep if i < len(ts_list)]
        return {"text": text, "timestamp": ts_list}

    def force_align(self, audio: np.ndarray, n_tokens: int,
                    sr: int = 16000) -> list:
        """[start_ms, end_ms] per token for a KNOWN token count, via CIF
        forced alignment (alphas scaled so exactly n_tokens fire)."""
        if self._align is None or n_tokens <= 0:
            return []
        audio = np.asarray(audio, np.float32)
        if sr != 16000:
            from ..ops.resample import resample_poly_np

            audio = resample_poly_np(audio, 16000, sr)
            sr = 16000
        top = _SAMPLE_LADDER.rungs[-1]
        audio = audio[:top]
        n_valid = features.num_frames(len(audio), sr)
        if n_valid == 0:
            return []
        t = -(-n_valid // LFR_N)
        n_tokens = min(n_tokens, t)
        bucket = _SAMPLE_LADDER.bucket(len(audio))
        padded = pad_to(audio, bucket)[None]
        from ..runtime.precision import quantize_i16

        fire = np.asarray(self._align(
            self._params_c, jnp.asarray(quantize_i16(padded)),
            jnp.asarray([t]), jnp.asarray([n_tokens])))[0, :n_tokens]
        return fire_frames_to_timestamps(fire, t)

    def asr_detection(self, audio: np.ndarray, sr: int = 16000, **kw) -> list:
        """[{'text': ..., 'timestamp': [[ms, ms], ...]}] — the contract
        TargetDiarization consumes (reference ASRProcessor.py:373-528)."""
        audio = np.asarray(audio, np.float32)
        if sr != 16000:
            from ..ops.resample import resample_poly_np

            audio = resample_poly_np(audio, 16000, sr)
            sr = 16000
        top = _SAMPLE_LADDER.rungs[-1]
        if len(audio) > top:
            # window at the top rung; concatenate texts, offset timestamps
            text_parts, ts_parts = [], []
            for i in range(0, len(audio), top):
                sub = self.asr_detection(audio[i: i + top], sr, **kw)[0]
                text_parts.append(sub["text"])
                off = int(i / sr * 1000)
                ts_parts.extend([[s + off, e + off]
                                 for s, e in sub.get("timestamp", [])])
            return [{"text": "".join(text_parts), "timestamp": ts_parts}]
        n_frames_valid = features.num_frames(len(audio), sr)
        if n_frames_valid == 0:
            return [{"text": "", "timestamp": []}]
        t = -(-n_frames_valid // LFR_N)  # LFR frame count of the real audio
        bucket = _SAMPLE_LADDER.bucket(len(audio))
        padded = pad_to(audio, bucket)[None]
        # ONE bulk transfer for every output (per-item np.asarray costs
        # a separate host-link round trip each)
        from ..runtime.precision import quantize_i16

        if self._mb is not None:
            return [self._mb.submit(bucket, (quantize_i16(padded)[0], t))]
        out = jax.device_get(
            self._apply(self._params_c, jnp.asarray(quantize_i16(padded)),
                        jnp.asarray([t])))
        return [self._decode_row(out, 0, t)]


def fire_frames_to_timestamps(fire_frames: np.ndarray, total_frames: int) -> list:
    """CIF fire positions → per-token [start_ms, end_ms] (LFR 60 ms)."""
    out = []
    prev = 0
    for f in fire_frames:
        f = int(f)
        if f < 0:
            break
        start = prev * FRAME_MS
        end = (f + 1) * FRAME_MS
        out.append([int(round(start)), int(round(end))])
        prev = f + 1
    return out
