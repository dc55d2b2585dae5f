"""End-to-end offline pipeline tests (small engines, real fixtures)."""

import numpy as np
import pytest

from targetdiarization_tpu.models.asr import ASREngine, Paraformer
from targetdiarization_tpu.models.diarization import SegmentationEngine, SegmentationNet
from targetdiarization_tpu.models.punctuation import CTTransformerPunc, PunctuationEngine
from targetdiarization_tpu.models.speaker import SpeakerEngine
from targetdiarization_tpu.models.tokenizer import CharTokenizer
from targetdiarization_tpu.pipeline.offline import TargetDiarization
from targetdiarization_tpu.pipeline.target_asr import TargetASR
from targetdiarization_tpu.processors.asr import ASRProcessor
from targetdiarization_tpu.processors.audio import AudioProcessor


@pytest.fixture(scope="module")
def pipeline():
    tok = CharTokenizer(vocab=["<blank>", "<s>", "</s>", "<unk>"] + list("abc一二三四五"))
    asrp = ASRProcessor()
    asrp.asr = ASREngine(
        model=Paraformer(vocab_size=len(tok), dim=32, ffn=64, enc_layers=2,
                         dec_layers=1),
        tokenizer=tok,
    )
    asrp.punc = PunctuationEngine(
        model=CTTransformerPunc(vocab_size=len(tok), dim=16, ffn=32, n_layers=1),
        tokenizer=tok,
    )
    spk = SpeakerEngine(model_name="eres2net", seed=0)
    tasr = TargetASR(audio_processor=AudioProcessor(), asr_processor=asrp,
                     speaker_engine=spk)
    seg = SegmentationEngine(model=SegmentationNet(n_layers=1), seed=1)
    return TargetDiarization(target_asr=tasr, segmentation_engine=seg)


class TestTargetASRStrategies:
    def test_single_speaker_asr(self, pipeline, chat_mix):
        audio, sr = chat_mix
        res = pipeline.tasr.single_speaker_asr(audio[: sr * 2])
        assert len(res) == 1
        r = res[0]
        assert set(r) == {"timerange", "text", "score", "sampling_rate", "audio"}
        assert r["score"] == 1.0

    def test_target_speaker_asr_merge(self, pipeline, chat_mix, female_a):
        audio, sr = chat_mix
        tgt, _ = female_a
        emb = pipeline.tasr.get_target_embedding(tgt)
        res = pipeline.tasr.target_speaker_asr(
            audio, target_embedding=emb, threshold=-1.0)  # accept all
        assert len(res) >= 1
        assert res[0]["timerange"][0] >= 0

    def test_target_speaker_asr_separate_mode(self, pipeline, chat_mix):
        audio, sr = chat_mix
        res = pipeline.tasr.target_speaker_asr(
            audio[: sr * 4], threshold=-1.0, audio_input_type="separate",
            is_output_audio=True)
        for r in res:
            assert isinstance(r["audio"], np.ndarray) and r["audio"].size > 0

    def test_multi_speakers_separate_asr(self, pipeline, chat_mix, female_a):
        audio, sr = chat_mix
        tgt, _ = female_a
        emb = pipeline.tasr.get_target_embedding(tgt)
        res = pipeline.tasr.multi_speakers_separate_asr(
            audio[: sr * 2], target_embedding=emb, threshold=0.0)
        # separator disabled → both streams are the input; both may pass VAD
        assert 0 <= len(res) <= 2

    def test_target_speaker_duration(self, pipeline, chat_mix, female_a):
        audio, sr = chat_mix
        tgt, _ = female_a
        emb = pipeline.tasr.get_target_embedding(tgt)
        res = pipeline.tasr.target_speaker_duration(
            np.asarray(audio), target_embedding=emb, threshold=0.4)
        assert set(res) == {"target_duration", "others_duration"}

    def test_mix_audio_processor_types(self, pipeline):
        silent = np.zeros(16000, np.float32)
        res = pipeline.tasr.mix_audio_processor(silent)
        assert res["type"] in ("noise", "single", "multi")
        assert "audio" in res and "score" in res


class TestOfflinePipeline:
    def test_infer_contract(self, pipeline, chat_mix, female_a):
        audio, sr = chat_mix
        tgt, _ = female_a
        target_spk, results, target_audio = pipeline.infer(
            np.asarray(audio), target_file=np.asarray(tgt), sampling_rate=sr)
        assert isinstance(results, list)
        for item in results:
            assert set(item) == {"speaker", "timerange", "text", "type", "score"}
            assert item["type"] in ("single", "overlap")
            s, e = item["timerange"]
            assert 0 <= s < e
        if results:
            assert target_spk in {r["speaker"] for r in results} or target_spk == ""
        if target_audio is not None:
            assert target_audio.dtype == np.float32

    def test_infer_single_mode(self, pipeline, chat_mix):
        audio, sr = chat_mix
        target_spk, results, _ = pipeline.infer(
            np.asarray(audio), is_single=True, output_target_audio=False)
        speakers = {r["speaker"] for r in results}
        assert speakers <= {"0"}

    def test_infer_no_target_audio_output(self, pipeline, chat_mix):
        audio, sr = chat_mix
        _, results, target_audio = pipeline.infer(
            np.asarray(audio), output_target_audio=False)
        assert target_audio is None
        for r in results:
            assert "audio" not in r

    def test_long_audio_routes_to_cluster_diarizer(self, pipeline, chat_mix,
                                                   monkeypatch):
        """≥30 s audio must use the clustering diarizer (reference
        TargetDiarization.py:99,124), not the segmentation engine."""
        audio, sr = chat_mix
        long_audio = np.tile(np.asarray(audio), 4)  # ~34.7 s
        called = {"cluster": 0}
        # the fused frontend enters via diarize_from_windows; the
        # per-engine fallback via diarize — either counts as routing
        # to the cluster diarizer
        for name in ("diarize", "diarize_from_windows"):
            orig = getattr(pipeline.sd_pipeline, name)

            def spy(*a, _orig=orig, **k):
                called["cluster"] += 1
                return _orig(*a, **k)

            monkeypatch.setattr(pipeline.sd_pipeline, name, spy)
        _, results, _ = pipeline.infer(long_audio, output_target_audio=False)
        assert called["cluster"] == 1
        assert isinstance(results, list)

    def test_results_sorted_by_time(self, pipeline, chat_mix):
        audio, sr = chat_mix
        _, results, _ = pipeline.infer(np.asarray(audio), output_target_audio=False)
        starts = [r["timerange"][0] for r in results]
        assert starts == sorted(starts)


class TestAssembly:
    def test_combine_audio_chunks_timeline(self):
        asr_result = [
            {"speaker": "0", "timerange": [1.0, 2.0],
             "audio": np.ones(16000, np.float32)},
            {"speaker": "1", "timerange": [2.0, 3.0],
             "audio": np.ones(16000, np.float32) * 2},
            {"speaker": "0", "timerange": [3.0, 4.0],
             "audio": np.ones(16000, np.float32) * 3},
        ]
        combined = TargetDiarization.combine_audio_chunks(asr_result, "0")
        # 1s silence + 1s ones + 1s silence (gap 2→3) + 1s threes
        assert len(combined) == 4 * 16000
        assert np.all(combined[:16000] == 0)
        assert np.all(combined[16000:32000] == 1)
        assert np.all(combined[32000:48000] == 0)
        assert np.all(combined[48000:] == 3)


class TestReclusterSd:
    """Unit coverage for the pyannote-style reclustering stage with a
    stub speaker engine whose embeddings we control exactly."""

    def _pipeline_with_embeddings(self, emb_fn):
        from targetdiarization_tpu.pipeline.offline import TargetDiarization

        td = TargetDiarization.__new__(TargetDiarization)
        td.recluster_threshold = 0.6
        td.verbose_log = False

        class AP:
            @staticmethod
            def split_audio_by_time(audio, sr, s, e):
                return audio[int(s * sr): int(e * sr)]

        class SPK:
            @staticmethod
            def embed_batch(clips, sr=16000):
                return np.stack([emb_fn(len(c) / sr, c) for c in clips])

        class TASR:
            spk = SPK()

        td.ap = AP()
        td.tasr = TASR()
        td._log = lambda *a, **k: None
        return td

    def test_splits_channel_by_voice_and_attributes_overlap(self):
        """One segmentation channel spanning two different voices must
        split; the overlap span lands under BOTH adjacent voices."""
        sr = 16000
        audio = np.zeros(sr * 9, np.float32)
        # voice A in [0, 2), voice B in [5, 9): orthogonal embeddings
        ea = np.array([1.0, 0.0], np.float32)
        eb = np.array([0.0, 1.0], np.float32)

        def emb(dur, clip):
            # identify the clip by where it was cut from (length is
            # unique per span in this fixture)
            return ea if abs(dur - 1.9) < 0.05 else eb

        td = self._pipeline_with_embeddings(emb)
        seg_sd = {"2": [(0.0, 7.8), (8.0, 8.7)], "0": [(1.9, 5.1)]}
        out = td._recluster_sd(audio, sr, seg_sd)
        # two voices, renumbered by first appearance (adjacent ranges
        # merge, so assert coverage rather than exact boundaries)
        assert set(out) == {"0", "1"}

        def covers(ranges, s, e):
            return any(rs <= s + 0.05 and re >= e - 0.05 for rs, re in ranges)

        assert covers(out["0"], 0.0, 1.9)       # voice A's clean span
        assert covers(out["1"], 5.1, 7.8)       # voice B's clean span
        assert covers(out["1"], 8.0, 8.7)       # short tail joins B
        assert not covers(out["0"], 5.1, 7.8)   # A must NOT own B's span
        # the overlap span appears under both labels
        assert covers(out["0"], 2.0, 5.0)
        assert covers(out["1"], 2.0, 5.0)

    def test_same_voice_stays_merged(self):
        sr = 16000
        audio = np.zeros(sr * 9, np.float32)
        e = np.array([1.0, 0.0], np.float32)
        td = self._pipeline_with_embeddings(lambda dur, clip: e)
        seg_sd = {"0": [(0.0, 2.0)], "1": [(3.0, 5.0)]}
        out = td._recluster_sd(audio, sr, seg_sd)
        assert len(out) == 1  # both pieces are the same voice
