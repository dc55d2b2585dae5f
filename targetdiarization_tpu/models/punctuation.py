"""CT-Transformer punctuation restoration.

TPU-native equivalent of the reference's FunASR CT-Transformer punc
model (`punc_ct-transformer_…vocab272727`, ASRProcessor.py:261-268,
punctuation_restore :880-899): a small bidirectional transformer over
character tokens predicting, for every position, which punctuation mark
(if any) follows it. Controllable-time semantics (the "CT") matter for
streaming; offline restoration is one parallel pass here.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..runtime.buckets import BucketLadder, pad_to
from ..runtime.registry import register_model
from .tokenizer import CharTokenizer

PUNC_LIST = ["", "，", "。", "？", "、", "！"]  # class 0 = no punctuation


@register_model(name="CTTransformerPunc")
class CTTransformerPunc(nn.Module):
    vocab_size: int = 21001  # len(default_vocab())
    dim: int = 256
    heads: int = 4
    ffn: int = 1024
    n_layers: int = 4
    n_classes: int = len(PUNC_LIST)

    @nn.compact
    def __call__(self, token_ids, mask):
        x = nn.Embed(self.vocab_size, self.dim, name="embed")(token_ids)
        t = x.shape[1]
        inv = 1.0 / (10000.0 ** (jnp.arange(0, self.dim, 2) / self.dim))
        ang = jnp.arange(t)[:, None] * inv[None, :]
        x = x + jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)[None]
        x = x * mask[..., None]
        for i in range(self.n_layers):
            h = nn.LayerNorm(name=f"ln1_{i}")(x)
            attn_mask = mask[:, None, None, :] > 0
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.heads, qkv_features=self.dim, name=f"attn_{i}"
            )(h, h, mask=attn_mask)
            x = x + h
            h = nn.LayerNorm(name=f"ln2_{i}")(x)
            h = nn.Dense(self.ffn, name=f"ff1_{i}")(h)
            h = jax.nn.relu(h)
            h = nn.Dense(self.dim, name=f"ff2_{i}")(h)
            x = (x + h) * mask[..., None]
        return nn.Dense(self.n_classes, name="head")(x)  # (B, T, C)


_TOKEN_LADDER = BucketLadder((16, 32, 64, 128, 256, 512, 1024))


class PunctuationEngine:
    def __init__(self, params=None, model: CTTransformerPunc | None = None,
                 tokenizer: CharTokenizer | None = None, seed: int = 0,
                 compute_dtype: str | None = None):
        self.tokenizer = tokenizer or CharTokenizer()
        self.model = model or CTTransformerPunc(vocab_size=len(self.tokenizer))
        if params is None:
            print("WARNING: PunctuationEngine initialized with RANDOM "
                  "weights — it will inject arbitrary punctuation. Train or "
                  "load a checkpoint (train.recipes.bootstrap_punc → "
                  "checkpoints/punc-bootstrap).")
            params = self.model.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, 16), jnp.int32),
                jnp.ones((1, 16)),
            )
        self.params = params
        from ..runtime.precision import resolve_compute_dtype, cast_params, cast_inputs, f32

        self.compute_dtype = resolve_compute_dtype(compute_dtype)
        self._params_c = cast_params(params, self.compute_dtype)

        def _fwd(p, ids, mask):
            (mask_c,) = cast_inputs(self.compute_dtype, mask)
            return f32(self.model.apply(p, ids, mask_c))

        self._apply = jax.jit(_fwd)

    @classmethod
    def from_pretrained(cls, path: str) -> "PunctuationEngine":
        import os

        from ..runtime.registry import from_pretrained

        model, params = from_pretrained(path)
        tok = CharTokenizer(vocab_file=os.path.join(path, "vocab.txt"))
        return cls(params=params, model=model, tokenizer=tok)

    def predict_classes(self, text: str) -> np.ndarray:
        ids = self.tokenizer.encode(text)
        n = len(ids)
        if n == 0:
            return np.zeros(0, np.int64)
        bucket = _TOKEN_LADDER.bucket(n)
        arr = pad_to(np.asarray(ids, np.int32), bucket)
        mask = np.zeros(bucket, np.float32)
        mask[:n] = 1.0
        logits = self._apply(
            self._params_c, jnp.asarray(arr)[None], jnp.asarray(mask)[None]
        )
        return np.asarray(jnp.argmax(logits[0, :n], axis=-1))

    def predict_classes_batch(self, texts: list) -> list:
        """Per-text punctuation classes with ONE device dispatch (all
        texts padded to the largest needed token bucket)."""
        ids_list = [self.tokenizer.encode(t) for t in texts]
        lens = [len(i) for i in ids_list]
        out: list = [np.zeros(0, np.int64)] * len(texts)
        idxs = [i for i, n in enumerate(lens) if n > 0]
        if not idxs:
            return out
        bucket = _TOKEN_LADDER.bucket(max(lens[i] for i in idxs))
        arr = np.stack([pad_to(np.asarray(ids_list[i], np.int32), bucket)
                        for i in idxs])
        mask = np.zeros((len(idxs), bucket), np.float32)
        for r, i in enumerate(idxs):
            mask[r, :lens[i]] = 1.0
        logits = np.asarray(self._apply(
            self._params_c, jnp.asarray(arr), jnp.asarray(mask)))
        cls = np.argmax(logits, axis=-1)
        for r, i in enumerate(idxs):
            out[i] = cls[r, :lens[i]]
        return out

    @staticmethod
    def _apply_classes(text: str, classes: np.ndarray) -> str:
        out = []
        for ch, c in zip(text, classes):
            out.append(ch)
            mark = PUNC_LIST[int(c)]
            if mark:
                out.append(mark)
        restored = "".join(out)
        # sentence-final normalization: ensure trailing terminal mark
        if restored and restored[-1] not in "。？！.!?":
            restored += "。"
        return restored

    def punctuation_restore(self, text: str) -> str:
        """Insert predicted punctuation after each character
        (reference ASRProcessor.punctuation_restore :880-899)."""
        if not text:
            return text
        return self._apply_classes(text, self.predict_classes(text))

    def punctuation_restore_batch(self, texts: list) -> list:
        """punctuation_restore over many texts in one device dispatch."""
        classes = self.predict_classes_batch(texts)
        return [self._apply_classes(t, c) if t else t
                for t, c in zip(texts, classes)]
