"""Fused-frontend parity tests: the one-dispatch analyze/enroll programs
must agree with the per-engine path they replace."""

import numpy as np
import pytest

from targetdiarization_tpu.models.diarization import (
    SegmentationEngine, SegmentationNet)
from targetdiarization_tpu.models.punctuation import (
    CTTransformerPunc, PunctuationEngine)
from targetdiarization_tpu.models.speaker import SpeakerEngine, cosine_similarity
from targetdiarization_tpu.models.tokenizer import CharTokenizer
from targetdiarization_tpu.models.vad import VADEngine
from targetdiarization_tpu.pipeline.fused import FusedFrontend
from targetdiarization_tpu.pipeline.offline import TargetDiarization


_CKPT = __import__("pathlib").Path(__file__).resolve().parent.parent / "checkpoints"


@pytest.fixture(scope="module")
def engines():
    """Shipped bootstrap checkpoints where available (trained VAD makes
    the trim-parity assertions meaningful); random fallbacks otherwise."""
    vad = (VADEngine.from_pretrained(str(_CKPT / "vad-bootstrap"))
           if (_CKPT / "vad-bootstrap").exists() else VADEngine(seed=0))
    spk = (SpeakerEngine.from_pretrained(str(_CKPT / "spk-bootstrap"))
           if (_CKPT / "spk-bootstrap").exists()
           else SpeakerEngine(model_name="eres2net", seed=1))
    seg = (SegmentationEngine.from_pretrained(str(_CKPT / "seg-bootstrap"))
           if (_CKPT / "seg-bootstrap").exists()
           else SegmentationEngine(model=SegmentationNet(n_layers=1), seed=2))
    return {"vad": vad, "spk": spk, "seg": seg}


@pytest.fixture(scope="module")
def frontend(engines):
    return FusedFrontend(denoiser=None, vad=engines["vad"],
                         seg=engines["seg"], spk=engines["spk"])


class TestAnalyze:
    def test_output_contract(self, frontend, chat_mix):
        audio, sr = chat_mix
        fr = frontend.analyze(audio, sr=sr)
        n = len(audio)
        assert fr["audio"].shape == (n,)
        assert fr["audio"].dtype == np.float32
        t = fr["vad_probs"].shape[0]
        assert abs(t - n // 160) <= 3
        assert np.all((fr["vad_probs"] >= 0) & (fr["vad_probs"] <= 1))
        assert fr["seg_act"].shape[0] == max(t // 4, 1)
        assert fr["win_embs"].shape[1] == 192
        assert len(fr["win_times"]) == fr["win_embs"].shape[0]
        # every window fully inside the valid audio
        for s, e in fr["win_times"]:
            assert e <= n / 16000 + 0.03

    def test_vad_probs_match_engine(self, frontend, engines, chat_mix):
        """Same denoise chain → same features → same probabilities.
        (Engine path: preprocess happens outside; here we feed the
        already-preprocessed audio back through the engine.)"""
        audio, sr = chat_mix
        fr = frontend.analyze(audio, sr=sr)
        probs_engine = engines["vad"].frame_probs(fr["audio"])
        t = min(len(probs_engine), len(fr["vad_probs"]))
        # int16 round-trip of the audio bounds the divergence
        np.testing.assert_allclose(fr["vad_probs"][:t], probs_engine[:t],
                                   atol=0.05)

    def test_window_embs_match_engine(self, frontend, engines, chat_mix):
        audio, sr = chat_mix
        fr = frontend.analyze(audio, sr=sr)
        sr = 16000
        for i in (0, len(fr["win_times"]) // 2):
            s, e = fr["win_times"][i]
            clip = fr["audio"][int(s * sr): int(e * sr)]
            emb = engines["spk"].get_speaker_embedding(clip)
            cos = cosine_similarity(fr["win_embs"][i], emb)
            # fused windows keep the full-track frame grid (150 frames,
            # last two peek past the window end); the sliced clip has 148
            assert cos > 0.95, f"window {i}: cos={cos}"


class TestEnroll:
    def test_embedding_matches_legacy_path(self, frontend, engines, female_a,
                                           chat_mix):
        audio, sr = female_a
        er = frontend.enroll(audio, sr=sr)
        assert er["emb"].shape == (192,)
        # legacy: preprocess → vad trim → embed (offline.py fallback)
        from targetdiarization_tpu.models.vad import VADConfig, segment_probs

        segs = segment_probs(er["vad_probs"], VADConfig())
        assert segs, "fixture should contain speech"
        s, e = segs[0][0], segs[-1][1]
        clip = er["audio"][int(s * 16000): int(e * 16000)]
        emb = engines["spk"].get_speaker_embedding(clip)
        cos_same = cosine_similarity(er["emb"], emb)
        # in-graph trim (probs>0.5 [first,last], full-track frame grid)
        # differs slightly from the sliced-audio path, and the trained
        # AM-softmax embedding space is angularly spread — so assert the
        # DISCRIMINATIVE property: the fused embedding is far closer to
        # the legacy embedding of the same audio than to other audio
        other, osr = chat_mix
        emb_other = engines["spk"].get_speaker_embedding(
            np.asarray(other)[: 2 * osr])
        cos_other = cosine_similarity(er["emb"], emb_other)
        # margin is small: the bootstrap speaker model is trained on
        # pitch-shifted variants of these very fixtures, so female_a and
        # the (female-containing) chat mix sit close in its space
        assert cos_same > 0.4, f"cos_same={cos_same}"
        assert cos_same > cos_other + 0.03, (cos_same, cos_other)


class TestPipelineIntegration:
    def test_infer_uses_fused_and_caches_enrollment(self, chat_mix, female_a,
                                                    monkeypatch):
        td = TargetDiarization()
        assert td.fused is not None
        audio, sr = chat_mix
        tgt, _ = female_a
        calls = {"enroll": 0}
        orig = td.fused.enroll

        def counting(*a, **k):
            calls["enroll"] += 1
            return orig(*a, **k)

        monkeypatch.setattr(td.fused, "enroll", counting)
        td.infer(np.asarray(audio), target_file=np.asarray(tgt),
                 sampling_rate=sr, output_target_audio=False)
        td.infer(np.asarray(audio), target_file=np.asarray(tgt),
                 sampling_rate=sr, output_target_audio=False)
        assert calls["enroll"] == 1  # second call served from the cache

    def test_fused_and_fallback_agree_on_segments(self, chat_mix):
        td = TargetDiarization()
        audio, sr = chat_mix
        _, res_fused, _ = td.infer(np.asarray(audio), sampling_rate=sr,
                                   output_target_audio=False)
        td.fused = None
        _, res_legacy, _ = td.infer(np.asarray(audio), sampling_rate=sr,
                                    output_target_audio=False)
        # same schema; segment boundaries within a window hop
        assert isinstance(res_fused, list) and isinstance(res_legacy, list)
        for r in res_fused:
            assert set(r) == {"speaker", "timerange", "text", "type", "score"}


class TestPunctuationBatch:
    def test_batch_matches_single(self):
        tok = CharTokenizer(vocab=["<blank>", "<s>", "</s>", "<unk>"]
                            + list("abc一二三"))
        eng = PunctuationEngine(
            model=CTTransformerPunc(vocab_size=len(tok), dim=16, ffn=32,
                                    n_layers=1),
            tokenizer=tok)
        texts = ["一二三", "abc", "", "一a二b三c一"]
        batch = eng.punctuation_restore_batch(texts)
        singles = [eng.punctuation_restore(t) for t in texts]
        # same bucket → identical logits; different bucket → padding only
        assert batch == singles


class TestFusedSeparation:
    def test_one_dispatch_matches_legacy_path(self, chat_mix):
        from targetdiarization_tpu.models.separation import (
            MossFormer2, SeparationEngine)
        from targetdiarization_tpu.models.speaker import SpeakerEngine
        from targetdiarization_tpu.models.vad import VADEngine
        from targetdiarization_tpu.pipeline.fused import FusedSeparation

        sep = SeparationEngine(model=MossFormer2(
            dim=32, enc_channels=32, num_blocks=1, group_size=32, qk_dim=16,
            fsmn_inner=32), seed=0)
        spk = SpeakerEngine(model_name="eres2net", seed=1)
        vad = VADEngine(seed=2)
        fused = FusedSeparation(sep=sep, spk=spk, vad=vad)
        audio, sr = chat_mix
        clips = [np.asarray(audio[: 2 * sr]), np.asarray(audio[2 * sr: 5 * sr])]
        res = fused.separate_score(clips, sr=sr)
        assert res is not None and len(res) == 2
        for r, c in zip(res, clips):
            assert r["streams"].shape == (2, len(c))
            assert r["embs"].shape == (2, 192)
            assert len(r["vads"]) == 2
        # streams must match the engine's own separation (same model,
        # modulo the int16 round-trip and bucket padding)
        legacy = sep.separate_batch([clips[0]], sr=sr)[0]
        got = res[0]["streams"]
        # loudness ordering may differ: compare best assignment
        def corr(a, b):
            a = a - a.mean(); b = b - b.mean()
            return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
        direct = (corr(got[0], legacy[0]) + corr(got[1], legacy[1])) / 2
        swapped = (corr(got[0], legacy[1]) + corr(got[1], legacy[0])) / 2
        assert max(direct, swapped) > 0.8, (direct, swapped)

    def test_multi_speakers_separate_batch_uses_fused(self, chat_mix,
                                                      monkeypatch):
        from targetdiarization_tpu.models.separation import (
            MossFormer2, SeparationEngine)
        from targetdiarization_tpu.pipeline.target_asr import TargetASR
        from targetdiarization_tpu.processors.audio import AudioProcessor

        ap = AudioProcessor()
        ap.separator = SeparationEngine(model=MossFormer2(
            dim=32, enc_channels=32, num_blocks=1, group_size=32, qk_dim=16,
            fsmn_inner=32), seed=0)
        tasr = TargetASR(audio_processor=ap)
        audio, sr = chat_mix
        target_emb = np.ones(192, np.float32)
        calls = {"fused": 0}
        fused = tasr._fused_separation()
        orig = fused.separate_score

        def spy(*a, **k):
            calls["fused"] += 1
            return orig(*a, **k)

        monkeypatch.setattr(fused, "separate_score", spy)
        out = tasr.multi_speakers_separate_batch(
            [np.asarray(audio[: 2 * sr])], target_emb, sr=sr)
        assert calls["fused"] == 1
        assert len(out) == 1
        for entry in out[0]:
            assert set(entry) == {"timerange", "text", "score",
                                  "sampling_rate", "audio"}
