"""Whisper-style ASR, emotion model, DER/CER metric tests."""

import numpy as np
import pytest

from targetdiarization_tpu.models.emotion import EMOTION_LABELS, EmotionEngine, EmotionNet
from targetdiarization_tpu.models.tokenizer import CharTokenizer
from targetdiarization_tpu.models.whisper_style import WhisperStyleASR, WhisperStyleEngine
from targetdiarization_tpu.train.eval_metrics import cer, der, wer


class TestWhisperStyle:
    @pytest.fixture(scope="class")
    def engine(self):
        tok = CharTokenizer(vocab=["<blank>", "<s>", "</s>", "<unk>"] + list("abc一二"))
        model = WhisperStyleASR(vocab_size=len(tok), dim=32, ffn=64,
                                enc_layers=1, dec_layers=1, max_tokens=16)
        return WhisperStyleEngine(model=model, tokenizer=tok, max_decode=8)

    def test_contract(self, engine, chat_mix):
        audio, sr = chat_mix
        res = engine.asr_detection(audio[: sr * 2], sr=sr)
        assert isinstance(res, list) and "text" in res[0]
        assert isinstance(res[0]["text"], str)

    def test_empty(self, engine):
        assert engine.asr_detection(np.zeros(10, np.float32)) == [
            {"text": "", "timestamp": []}]

    def test_processor_dispatch(self):
        from targetdiarization_tpu.processors.asr import ASRProcessor

        asrp = ASRProcessor(asr_engine="whisper", init_random_if_missing=False)
        assert "whisper" in asrp.LOCAL_ENGINES

    def test_padding_mask_parity(self, engine):
        """The same audio padded to two different static bucket sizes
        (same true n_frames) must decode identically — regression guard
        for the round-2 encoder-mask bug (whisper_style.py enc_mask)
        where padding leaked into cross-attention."""
        import jax.numpy as jnp

        from targetdiarization_tpu.models import features

        rng = np.random.default_rng(7)
        audio = (rng.standard_normal(8000) * 0.1).astype(np.float32)
        t = features.num_frames(len(audio))
        a1 = np.pad(audio, (0, 16000 - len(audio)))[None]
        a2 = np.pad(audio, (0, 32000 - len(audio)))[None]
        ids1 = np.asarray(engine._greedy(
            engine._params_c, jnp.asarray(a1), jnp.asarray([t])))
        ids2 = np.asarray(engine._greedy(
            engine._params_c, jnp.asarray(a2), jnp.asarray([t])))
        assert (ids1 == ids2).all(), (ids1, ids2)

    def test_input_dependence(self, engine):
        """Different audio must produce different encoder states —
        the round-2 bug made output input-independent."""
        import jax.numpy as jnp

        from targetdiarization_tpu.models import features
        from targetdiarization_tpu.models.whisper_style import WhisperStyleASR

        rng = np.random.default_rng(3)
        a = (rng.standard_normal((2, 16000)) * 0.1).astype(np.float32)
        t = features.num_frames(16000)
        feats = features.fbank(jnp.asarray(a))
        fmask = jnp.ones((2, feats.shape[1]))
        enc = engine.model.apply(engine._params_c, feats, fmask,
                                 method=WhisperStyleASR.encode)
        d = float(np.abs(np.asarray(enc[0]) - np.asarray(enc[1])).max())
        assert d > 1e-4, f"encoder states identical across inputs ({d})"

    def test_resample_path(self, engine):
        rng = np.random.default_rng(11)
        audio = (rng.standard_normal(8000) * 0.1).astype(np.float32)
        res = engine.asr_detection(audio, sr=8000)  # exercises 8k→16k
        assert isinstance(res[0]["text"], str)


class TestEmotion:
    def test_contract(self, chat_mix):
        audio, sr = chat_mix
        eng = EmotionEngine(model=EmotionNet(dim=32, n_layers=1))
        out = eng.emotion_detection(audio[: sr * 2], sr=sr)
        assert out["labels"] == EMOTION_LABELS
        assert len(out["scores"]) == len(EMOTION_LABELS)
        assert abs(sum(out["scores"]) - 1.0) < 1e-2  # softmax

    def test_empty(self):
        eng = EmotionEngine(model=EmotionNet(dim=32, n_layers=1))
        out = eng.emotion_detection(np.zeros(10, np.float32))
        assert sum(out["scores"]) == 0.0


class TestDER:
    def test_perfect(self):
        ref = {"0": [(0.0, 5.0)], "1": [(5.0, 10.0)]}
        assert der(ref, ref) == 0.0

    def test_label_permutation_is_free(self):
        ref = {"0": [(0.0, 5.0)], "1": [(5.0, 10.0)]}
        hyp = {"A": [(5.0, 10.0)], "B": [(0.0, 5.0)]}
        assert der(ref, hyp) == 0.0

    def test_miss_counts(self):
        ref = {"0": [(0.0, 10.0)]}
        hyp = {"0": [(0.0, 5.0)]}
        d = der(ref, hyp, collar=0.0)
        assert 0.45 < d < 0.55  # missed half the speech

    def test_false_alarm(self):
        ref = {"0": [(0.0, 5.0)]}
        hyp = {"0": [(0.0, 10.0)]}
        d = der(ref, hyp, collar=0.0)
        assert 0.9 < d < 1.1  # 5 s FA over 5 s ref speech

    def test_empty_cases(self):
        assert der({}, {}) == 0.0
        assert der({}, {"0": [(0, 1)]}) == 1.0


class TestCERWER:
    def test_cer_identity_and_known(self):
        assert cer("今天天气", "今天天气") == 0.0
        assert cer("abcd", "abed") == 0.25
        assert cer("", "") == 0.0
        assert cer("", "x") == 1.0

    def test_cer_ignores_whitespace(self):
        assert cer("a b c", "abc") == 0.0

    def test_wer(self):
        assert wer("the cat sat", "the cat sat") == 0.0
        assert wer("the cat sat", "the dog sat") == pytest.approx(1 / 3)
