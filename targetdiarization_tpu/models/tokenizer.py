"""Character tokenizer for the ASR/punctuation stack.

The reference's ASR models carry their vocabularies inside funasr
checkpoint bundles (Paraformer: ~8.4k tokens, char-level for Chinese +
BPE-ish English pieces). With no checkpoints in this environment the
framework ships a deterministic built-in char vocabulary — printable
ASCII + the CJK Unified Ideographs block — and loads a custom vocab
file (one token per line) when a trained model provides one.
"""

from __future__ import annotations

import os

BLANK, SOS, EOS, UNK = "<blank>", "<s>", "</s>", "<unk>"


def default_vocab() -> list:
    specials = [BLANK, SOS, EOS, UNK]
    ascii_printable = [chr(c) for c in range(0x20, 0x7F)]
    cjk = [chr(c) for c in range(0x4E00, 0x9FA6)]
    return specials + ascii_printable + cjk


class CharTokenizer:
    def __init__(self, vocab: list | None = None, vocab_file: str | None = None):
        if vocab is None and vocab_file and os.path.exists(vocab_file):
            with open(vocab_file, encoding="utf-8") as f:
                vocab = [line.rstrip("\n") for line in f if line.rstrip("\n")]
        self.vocab = vocab or default_vocab()
        self.token_to_id = {t: i for i, t in enumerate(self.vocab)}
        self.blank_id = self.token_to_id.get(BLANK, 0)
        self.sos_id = self.token_to_id.get(SOS, 1)
        self.eos_id = self.token_to_id.get(EOS, 2)
        self.unk_id = self.token_to_id.get(UNK, 3)

    def __len__(self) -> int:
        return len(self.vocab)

    def encode(self, text: str) -> list:
        return [self.token_to_id.get(ch, self.unk_id) for ch in text]

    def decode(self, ids, strip_special: bool = True) -> str:
        out = []
        for i in ids:
            i = int(i)
            if i < 0 or i >= len(self.vocab):
                continue
            tok = self.vocab[i]
            if strip_special and tok in (BLANK, SOS, EOS):
                continue
            out.append("" if (strip_special and tok == UNK) else tok)
        return "".join(out)

    def save(self, path: str):
        with open(path, "w", encoding="utf-8") as f:
            f.write("\n".join(self.vocab))
