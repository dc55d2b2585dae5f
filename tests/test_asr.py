"""ASR stack tests: tokenizer, CIF, Paraformer, SenseVoice, punctuation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from targetdiarization_tpu.models.asr import (
    ASREngine,
    Paraformer,
    SenseVoice,
    cif_fire,
    ctc_greedy,
    fire_frames_to_timestamps,
    LFR_M,
)
from targetdiarization_tpu.models.punctuation import PunctuationEngine, PUNC_LIST
from targetdiarization_tpu.models.tokenizer import CharTokenizer


class TestTokenizer:
    def test_roundtrip_mixed(self):
        tok = CharTokenizer()
        text = "hello 世界123"
        assert tok.decode(tok.encode(text)) == text

    def test_unknown_char_maps_to_unk(self):
        tok = CharTokenizer()
        ids = tok.encode("é")  # not in ASCII/CJK vocab
        assert ids == [tok.unk_id]

    def test_vocab_file_roundtrip(self, tmp_path):
        tok = CharTokenizer()
        tok.save(str(tmp_path / "vocab.txt"))
        tok2 = CharTokenizer(vocab_file=str(tmp_path / "vocab.txt"))
        assert tok2.vocab == tok.vocab


class TestCIF:
    def test_uniform_alphas_fire_count(self):
        """alpha=0.5 per frame → one token per 2 frames."""
        t = 20
        hidden = jnp.ones((1, t, 4))
        alphas = jnp.full((1, t), 0.5)
        tokens, fires, fire_frames, n = cif_fire(hidden, alphas)
        assert int(n[0]) == 10
        # fires at frames 1, 3, 5, ...
        np.testing.assert_array_equal(
            np.asarray(fire_frames[0, :10]), np.arange(1, 20, 2)
        )

    def test_token_embedding_is_weighted_sum(self):
        """Each token accumulates exactly threshold=1.0 of alpha mass."""
        t = 4
        hidden = jnp.asarray(
            np.arange(t, dtype=np.float32).reshape(1, t, 1) + 1.0
        )  # frames 1,2,3,4
        alphas = jnp.asarray([[0.6, 0.6, 0.6, 0.6]])
        tokens, fires, fire_frames, n = cif_fire(hidden, alphas)
        assert int(n[0]) == 2
        # token0 = 0.6*1 + 0.4*2 = 1.4 ; token1 = 0.2*2 + 0.6*3 + 0.2*4 = 3.0
        np.testing.assert_allclose(np.asarray(tokens[0, 0, 0]), 1.4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(tokens[0, 1, 0]), 3.0, atol=1e-5)

    def test_zero_alphas_no_tokens(self):
        tokens, fires, fire_frames, n = cif_fire(
            jnp.ones((1, 8, 2)), jnp.zeros((1, 8))
        )
        assert int(n[0]) == 0
        assert np.all(np.asarray(fire_frames[0]) == -1)

    def test_timestamps_from_fires(self):
        ts = fire_frames_to_timestamps(np.array([1, 3, 7]), 10)
        assert ts == [[0, 120], [120, 240], [240, 480]]


class TestCTCGreedy:
    def test_collapse(self):
        assert ctc_greedy(np.array([0, 1, 1, 0, 2, 2, 2, 1]), 0) == [1, 2, 1]


def small_tok():
    return CharTokenizer(vocab=["<blank>", "<s>", "</s>", "<unk>"] + list("abcde一二三"))


class TestParaformer:
    @pytest.fixture(scope="class")
    def engine(self):
        tok = small_tok()
        model = Paraformer(vocab_size=len(tok), dim=32, ffn=64, enc_layers=2, dec_layers=1)
        return ASREngine(model=model, tokenizer=tok, seed=0)

    def test_asr_contract(self, engine, chat_mix):
        audio, sr = chat_mix
        res = engine.asr_detection(audio[: sr * 2], sr=sr)
        assert isinstance(res, list) and set(res[0]) >= {"text", "timestamp"}
        # every timestamp is [start_ms, end_ms] with end > start
        for s, e in res[0]["timestamp"]:
            assert e > s >= 0

    def test_empty_audio(self, engine):
        res = engine.asr_detection(np.zeros(10, np.float32))
        assert res == [{"text": "", "timestamp": []}]

    def test_timestamp_count_matches_text(self, engine, chat_mix):
        audio, sr = chat_mix
        res = engine.asr_detection(audio[: sr * 2], sr=sr)[0]
        assert len(res["timestamp"]) <= max(len(res["text"]), 1) + 4


class TestSenseVoice:
    def test_rich_output(self, chat_mix):
        tok = small_tok()
        model = SenseVoice(vocab_size=len(tok), dim=32, ffn=64, enc_layers=2)
        eng = ASREngine(model=model, tokenizer=tok, seed=0)
        audio, sr = chat_mix
        res = eng.asr_detection(audio[: sr * 1], sr=sr)[0]
        assert "raw_text" in res and res["raw_text"].startswith("<|")
        assert res["language"] and res["emotion"] and res["event"]


class TestPunctuation:
    def test_restore_mechanics(self):
        tok = small_tok()
        from targetdiarization_tpu.models.punctuation import CTTransformerPunc

        eng = PunctuationEngine(
            model=CTTransformerPunc(vocab_size=len(tok), dim=16, ffn=32, n_layers=1),
            tokenizer=tok,
        )
        out = eng.punctuation_restore("abcab")
        # all input chars preserved in order
        stripped = "".join(ch for ch in out if ch not in "".join(PUNC_LIST) + "。")
        assert stripped == "abcab"
        assert out[-1] in "。？！"

    def test_empty(self):
        tok = small_tok()
        from targetdiarization_tpu.models.punctuation import CTTransformerPunc

        eng = PunctuationEngine(
            model=CTTransformerPunc(vocab_size=len(tok), dim=16, ffn=32, n_layers=1),
            tokenizer=tok,
        )
        assert eng.punctuation_restore("") == ""


class TestForceAlign:
    """CIF forced alignment (the fa-zh timestamp-predictor slot)."""

    def test_force_align_counts_and_monotonic(self, rng):
        from targetdiarization_tpu.models.asr import ASREngine, Paraformer
        from targetdiarization_tpu.models.tokenizer import CharTokenizer

        tok = CharTokenizer(vocab=["<blank>", "<s>", "</s>", "<unk>"]
                            + list("abc"))
        eng = ASREngine(model=Paraformer(vocab_size=len(tok), dim=32, ffn=64,
                                         enc_layers=1, dec_layers=1),
                        tokenizer=tok)
        audio = rng.standard_normal(32000).astype(np.float32) * 0.1
        ts = eng.force_align(audio, 7)
        assert len(ts) == 7
        for (s0, e0), (s1, e1) in zip(ts, ts[1:]):
            assert s0 <= s1 and e0 <= e1  # monotonic
        assert all(e > s for s, e in ts)

    def test_processor_timestamp_prediction_uses_alignment(self):
        import pathlib

        ckpt = (pathlib.Path(__file__).resolve().parent.parent
                / "checkpoints" / "asr-bootstrap")
        if not ckpt.exists():
            pytest.skip("asr-bootstrap not present")
        from targetdiarization_tpu.models.asr import ASREngine
        from targetdiarization_tpu.processors.asr import ASRProcessor
        from targetdiarization_tpu.train.synth import synth_utterance

        asrp = ASRProcessor()
        asrp.asr = ASREngine.from_pretrained(str(ckpt))
        gen = np.random.default_rng(7)
        text = "三一五一二"
        audio, ranges = synth_utterance(text, gen)
        ts = asrp.timestamp_prediction(audio, text)
        assert len(ts) == len(text)
        # aligned boundaries should land near the true char midpoints
        err = [abs((s + e) / 2 - (ts_[0] + ts_[1]) / 2 * 0.001)
               for (s, e), ts_ in zip(ranges, ts)]
        assert float(np.mean(err)) < 0.30, err


class TestWhisperVariants:
    """Per-variant regression for the three real Whisper engines
    (reference ships whisper_v2/v3/finetune as distinct engines,
    ASRProcessor.py:229-252). Each test loads its own checkpoint dir —
    no fallback — and holds a CER ceiling on fresh held-out synthetic
    utterances. Ceilings leave ~2× slack over the training run's
    measured eval (metrics.json in each checkpoint dir)."""

    def _cer_for(self, name, n_utts=12, seed=20260821, preprocess=False):
        import pathlib

        ckpt = (pathlib.Path(__file__).resolve().parent.parent
                / "checkpoints" / name)
        if not (ckpt / "model.json").exists():
            pytest.skip(f"{name} not present")
        from targetdiarization_tpu.models.whisper_style import (
            WhisperStyleEngine)
        from targetdiarization_tpu.train.synth import (
            cer, random_text, synth_utterance)

        eng = WhisperStyleEngine.from_pretrained(str(ckpt))
        gen = np.random.default_rng(seed)
        cers = []
        for _ in range(n_utts):
            text = random_text(gen, 2, 10)
            audio, _ = synth_utterance(text, gen)
            res = eng.asr_detection(audio)[0]
            cers.append(cer(text, res["text"]))
        return float(np.mean(cers)), float(np.mean([c == 0 for c in cers]))

    def test_whisper_v3(self):
        mean_cer, exact = self._cer_for("whisper-v3")
        assert mean_cer <= 0.06, f"whisper-v3 CER {mean_cer}"
        assert exact >= 0.75, f"whisper-v3 exact {exact}"

    def test_whisper_v2(self):
        # training eval: CER 0.025, 96.7% exact (whisper-v2/metrics.json)
        mean_cer, exact = self._cer_for("whisper-v2")
        assert mean_cer <= 0.08, f"whisper-v2 CER {mean_cer}"
        assert exact >= 0.75, f"whisper-v2 exact {exact}"

    def test_whisper_finetune(self):
        mean_cer, exact = self._cer_for("whisper-finetune")
        assert mean_cer <= 0.06, f"whisper-finetune CER {mean_cer}"
        assert exact >= 0.75, f"whisper-finetune exact {exact}"

    def test_variants_are_distinct_checkpoints(self):
        """All three dirs exist and hold distinct weights (the round-4
        gap: three names routed onto one fallback checkpoint)."""
        import pathlib

        root = (pathlib.Path(__file__).resolve().parent.parent
                / "checkpoints")
        dirs = [root / n for n in
                ("whisper-v2", "whisper-v3", "whisper-finetune")]
        if not all(d.exists() for d in dirs):
            pytest.skip("whisper variant checkpoints not all present")
        from targetdiarization_tpu.runtime.params import load_checkpoint

        sums = []
        for d in dirs:
            params, _ = load_checkpoint(str(d))
            leaves = jax.tree_util.tree_leaves(params)
            sums.append(float(sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                                  for l in leaves)))
        assert len(set(sums)) == 3, f"variant weights not distinct: {sums}"
