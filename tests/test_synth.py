"""Synthetic-language corpus generator (train/synth.py)."""

import numpy as np

from targetdiarization_tpu.train.synth import (
    BOOT_CHARS, QUESTION_CHAR, UnitPool, cer, punctuate_by_rule,
    random_text, synth_utterance)


class TestSynth:
    def test_utterance_ranges_align(self):
        gen = np.random.default_rng(0)
        text = "一二三"
        audio, ranges = synth_utterance(text, gen)
        assert len(ranges) == 3
        sr = 16000
        for (s, e) in ranges:
            seg = audio[int(s * sr): int(e * sr)]
            outside_rms = np.sqrt(np.mean(audio[: int(ranges[0][0] * sr)] ** 2)
                                  + 1e-12)
            assert np.sqrt(np.mean(seg ** 2)) > 5 * outside_rms

    def test_unitpool_matches_contract(self):
        pool = UnitPool(variants=3, seed=1)
        gen = np.random.default_rng(0)
        audio, ranges = pool.utterance("五六", gen)
        assert len(ranges) == 2 and audio.dtype == np.float32
        assert ranges[0][1] <= ranges[1][0]

    def test_chars_have_distinct_spectra(self):
        gen = np.random.default_rng(0)
        specs = []
        for ch in BOOT_CHARS[:6]:
            a, _ = synth_utterance(ch, gen)
            f = np.abs(np.fft.rfft(a, 4096))
            specs.append(f / (np.linalg.norm(f) + 1e-9))
        cors = [float(np.dot(specs[i], specs[j]))
                for i in range(6) for j in range(i + 1, 6)]
        assert max(cors) < 0.9, "char spectra not distinct"

    def test_punctuate_by_rule(self):
        text = "一二三四五六七八"
        out, cls = punctuate_by_rule(text)
        assert out == "一二三四，五六七八。"
        assert len(cls) == len(text)
        q, _ = punctuate_by_rule("一" + QUESTION_CHAR)
        assert q.endswith("？")

    def test_cer(self):
        assert cer("abc", "abc") == 0.0
        assert cer("abc", "abd") == 1 / 3
        assert cer("abc", "") == 1.0
        assert cer("", "") == 0.0

    def test_random_text_in_vocab(self):
        gen = np.random.default_rng(2)
        for _ in range(20):
            t = random_text(gen)
            assert t and all(c in BOOT_CHARS for c in t)
