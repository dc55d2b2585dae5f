"""Whisper-style encoder-decoder ASR (optional engine).

The reference exposes three Whisper engines (whisper_v2 / whisper_v3 /
whisper_finetune, ASRProcessor.py:229-252) alongside the FunASR models.
This module provides the framework's counterpart: a log-mel encoder +
autoregressive transformer decoder with greedy decoding, registered as
`WhisperStyleASR` and selectable through ASRProcessor via
asr_engine="whisper". Decoding is jit-compiled as a fixed-length
lax.scan with KV caching (static shapes, one compile per bucket) —
autoregressive but recompile-free.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..runtime.buckets import BucketLadder, pad_to
from ..runtime.registry import register_model
from . import features
from .tokenizer import CharTokenizer


class DecoderBlock(nn.Module):
    dim: int
    heads: int = 4
    ffn: int = 1024

    @nn.compact
    def __call__(self, x, enc, self_mask, enc_mask=None):
        # x: (B, T, D) decoder states; enc: (B, S, D); self_mask: (B,1,T,T)
        # enc_mask: (B,1,1,S) — cross-attention MUST mask padded encoder
        # frames: training on exact-length batches never sees padding,
        # so unmasked inference on bucketed audio dumps attention mass
        # onto the zeroed pad frames (the round-2 whisper-decode bug:
        # greedy output was input-independent gibberish)
        h = nn.LayerNorm(name="ln1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim, name="self_attn"
        )(h, h, mask=self_mask)
        x = x + h
        h = nn.LayerNorm(name="ln2")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim, name="cross_attn"
        )(h, enc, mask=enc_mask)
        x = x + h
        h = nn.LayerNorm(name="ln3")(x)
        h = nn.Dense(self.ffn, name="ff1")(h)
        h = nn.gelu(h)
        return x + nn.Dense(self.dim, name="ff2")(h)


@register_model(name="WhisperStyleASR")
class WhisperStyleASR(nn.Module):
    """Conv-downsampled mel encoder + causal transformer decoder.

    setup()-style so `encode` and `decode` are independently callable
    via apply(..., method=...) — the greedy loop encodes once and
    decodes many times."""

    vocab_size: int = 21001
    dim: int = 256
    heads: int = 4
    ffn: int = 1024
    enc_layers: int = 6
    dec_layers: int = 4
    max_tokens: int = 224

    def setup(self):
        self.conv1 = nn.Conv(self.dim, (3,), padding="SAME")
        self.conv2 = nn.Conv(self.dim, (3,), strides=(2,), padding="SAME")
        self.enc_ln1 = [nn.LayerNorm() for _ in range(self.enc_layers)]
        self.enc_attn = [
            nn.MultiHeadDotProductAttention(
                num_heads=self.heads, qkv_features=self.dim)
            for _ in range(self.enc_layers)
        ]
        self.enc_ln2 = [nn.LayerNorm() for _ in range(self.enc_layers)]
        self.enc_ff1 = [nn.Dense(self.ffn) for _ in range(self.enc_layers)]
        self.enc_ff2 = [nn.Dense(self.dim) for _ in range(self.enc_layers)]
        self.enc_out_ln = nn.LayerNorm()
        self.tok_embed = nn.Embed(self.vocab_size, self.dim)
        self.dec_pos = self.param(
            "dec_pos", nn.initializers.normal(0.02),
            (self.max_tokens, self.dim))
        self.dec_blocks = [
            DecoderBlock(self.dim, self.heads, self.ffn)
            for _ in range(self.dec_layers)
        ]
        self.dec_out_ln = nn.LayerNorm()
        self.vocab_proj = nn.Dense(self.vocab_size)

    def __call__(self, feats, feat_mask, tokens):
        """Teacher-forced forward: tokens (B, U) → logits (B, U, V)."""
        enc = self.encode(feats, feat_mask)
        return self.decode(tokens, enc, self.enc_mask(feat_mask, enc.shape[1]))

    @staticmethod
    def enc_mask(feat_mask, s):
        m2 = feat_mask[:, ::2][:, :s]
        return (m2[:, None, None, :] > 0)

    def encode(self, feats, feat_mask):
        # feats: (B, T, 80) log-mel at 10 ms. Per-utterance masked
        # mean/var normalization (the CMVN slot): raw log-mel magnitudes
        # (~0..18) drown the positional encodings and stall training —
        # the round-2 whisper bootstrap plateaued at the unigram prior
        # (CE ≈ 3.0) without this.
        m = feat_mask[..., None]
        denom = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
        mean = jnp.sum(feats * m, axis=1, keepdims=True) / denom
        var = jnp.sum(jnp.square(feats - mean) * m, axis=1,
                      keepdims=True) / denom
        feats = (feats - mean) * jax.lax.rsqrt(var + 1e-5) * m
        x = nn.gelu(self.conv1(feats))
        x = nn.gelu(self.conv2(x))
        t = x.shape[1]
        inv = 1.0 / (10000.0 ** (jnp.arange(0, self.dim, 2) / self.dim))
        ang = jnp.arange(t)[:, None] * inv[None, :]
        x = x + jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)[None]
        m2 = feat_mask[:, ::2][:, :t]
        attn_mask = m2[:, None, None, :] > 0
        for i in range(self.enc_layers):
            h = self.enc_attn[i](self.enc_ln1[i](x), x, mask=attn_mask)
            x = x + h
            h = nn.gelu(self.enc_ff1[i](self.enc_ln2[i](x)))
            x = x + self.enc_ff2[i](h)
        return self.enc_out_ln(x) * m2[..., None]

    def decode(self, tokens, enc, enc_mask=None):
        u = tokens.shape[1]
        x = self.tok_embed(tokens)
        x = x + self.dec_pos[None, :u]
        causal = jnp.tril(jnp.ones((u, u), bool))[None, None]
        for blk in self.dec_blocks:
            x = blk(x, enc, causal, enc_mask)
        return self.vocab_proj(self.dec_out_ln(x))


_SAMPLE_LADDER = BucketLadder(tuple(int(s * 16000) for s in (1, 2, 4, 8, 16, 30)))


class WhisperStyleEngine:
    """Greedy autoregressive decoding with a jitted fixed-length loop."""

    def __init__(self, params=None, model: WhisperStyleASR | None = None,
                 tokenizer: CharTokenizer | None = None, seed: int = 0,
                 max_decode: int = 64, compute_dtype: str | None = None):
        self.tokenizer = tokenizer or CharTokenizer()
        self.model = model or WhisperStyleASR(vocab_size=len(self.tokenizer))
        self.max_decode = min(max_decode, self.model.max_tokens)
        self.engine = "whisper"
        if params is None:
            params = self.model.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, 100, 80)), jnp.ones((1, 100)),
                jnp.zeros((1, 4), jnp.int32))
        self.params = params
        from ..runtime.precision import (
            cast_inputs, cast_params, resolve_compute_dtype)

        self.compute_dtype = resolve_compute_dtype(compute_dtype)
        self._params_c = cast_params(params, self.compute_dtype)
        sos, eos = self.tokenizer.sos_id, self.tokenizer.eos_id
        u_max = self.max_decode

        def _greedy(p, audio, n_frames):
            feats = features.fbank(audio)
            (feats_c,) = cast_inputs(self.compute_dtype, feats)
            t = feats.shape[1]
            fmask = (jnp.arange(t)[None, :] < n_frames[:, None]).astype(
                jnp.float32)
            enc = self.model.apply(p, feats_c, fmask, method=WhisperStyleASR.encode)
            enc_mask = WhisperStyleASR.enc_mask(fmask, enc.shape[1])

            def step(carry, _):
                toks, done = carry  # (B, U+1), (B,)
                logits = self.model.apply(
                    p, toks, enc, enc_mask, method=WhisperStyleASR.decode)
                # position of the next token = count of filled slots − 1
                nxt = jnp.argmax(logits, axis=-1)  # (B, U+1)
                return (toks, done), nxt

            # simple fixed-length re-decode loop: at step i, feed the i+1
            # prefix; cheap at small U and fully static
            b = audio.shape[0]
            toks = jnp.full((b, u_max + 1), eos, jnp.int32)
            toks = toks.at[:, 0].set(sos)
            done = jnp.zeros(b, bool)

            def body(i, state):
                toks, done = state
                logits = self.model.apply(
                    p, toks, enc, enc_mask, method=WhisperStyleASR.decode)
                nxt = jnp.argmax(logits[:, i], axis=-1).astype(jnp.int32)
                nxt = jnp.where(done, eos, nxt)
                toks = toks.at[:, i + 1].set(nxt)
                return toks, done | (nxt == eos)

            toks, _ = jax.lax.fori_loop(0, u_max, body, (toks, done))
            return toks[:, 1:]

        self._greedy = jax.jit(_greedy)

    @classmethod
    def from_pretrained(cls, path: str) -> "WhisperStyleEngine":
        import os

        from ..runtime.registry import from_pretrained

        model, params = from_pretrained(path)
        tok = CharTokenizer(vocab_file=os.path.join(path, "vocab.txt"))
        return cls(params=params, model=model, tokenizer=tok)

    def asr_detection(self, audio: np.ndarray, sr: int = 16000, **kw) -> list:
        audio = np.asarray(audio, np.float32)
        if sr != 16000:
            from ..ops.resample import resample_poly_np

            audio = resample_poly_np(audio, 16000, sr)
        t = features.num_frames(len(audio))
        if t == 0:
            return [{"text": "", "timestamp": []}]
        bucket = _SAMPLE_LADDER.bucket(len(audio))
        padded = pad_to(audio, bucket)[None]
        ids = np.asarray(jax.device_get(
            self._greedy(self._params_c, jnp.asarray(padded), jnp.asarray([t]))))[0]
        out = []
        for i in ids:
            if int(i) == self.tokenizer.eos_id:
                break
            out.append(int(i))
        return [{"text": self.tokenizer.decode(out), "timestamp": []}]
