"""Processor hub tests: AudioProcessor + ASRProcessor public surfaces."""

import numpy as np
import pytest

from targetdiarization_tpu.processors import AudioProcessor, ASRProcessor


@pytest.fixture(scope="module")
def ap():
    return AudioProcessor()


@pytest.fixture(scope="module")
def asrp():
    return ASRProcessor()


class TestAudioProcessorDSP:
    def test_read_audio_and_mono(self, ap):
        audio, sr = ap.read_audio("/root/reference/assets/chat_mix.wav")
        assert sr == 16000 and audio.ndim == 1
        stereo = np.stack([audio[:1000], audio[:1000]])
        mono = ap.audio_to_mono(stereo)
        np.testing.assert_allclose(mono, audio[:1000], atol=1e-6)

    def test_int16_roundtrip(self, ap):
        x = np.array([-1.0, 0.0, 0.5], np.float32)
        i = ap.float32_to_int16(x)
        back = ap.int16_to_float32(i)
        np.testing.assert_allclose(back, [-1.0, 0.0, 0.5], atol=1e-4)

    def test_resample(self, ap):
        audio = np.sin(np.linspace(0, 100, 16000)).astype(np.float32)
        out, sr = ap.audio_resample(audio, 16000, 8000)
        assert sr == 8000 and abs(len(out) - 8000) <= 1

    def test_loudness_control(self, ap, chat_mix):
        audio, sr = chat_mix
        out = ap.audio_loudness_control(audio, sr, target_loudness=-23.0)
        lufs = ap.meter_loudness(out, sr)
        assert abs(lufs - (-23.0)) < 1.0

    def test_loudness_short_audio_passthrough(self, ap):
        a = np.ones(100, np.float32) * 0.1
        np.testing.assert_array_equal(ap.audio_loudness_control(a, 16000), a)
        assert ap.meter_loudness(a, 16000) == float("-inf")

    def test_split_by_time(self, ap):
        a = np.arange(16000, dtype=np.float32)
        out = ap.split_audio_by_time(a, 16000, 0.25, 0.5)
        assert len(out) == 4000 and out[0] == 4000

    def test_split_by_silence(self, ap):
        sr = 16000
        loud = np.random.default_rng(0).standard_normal(sr).astype(np.float32) * 0.5
        quiet = np.zeros(sr, np.float32)
        audio = np.concatenate([loud, quiet, loud])
        chunks = ap.split_audio_by_silence(audio, sr, min_chunk_sec=0.5)
        assert len(chunks) >= 2
        assert sum(len(c) for c in chunks) == len(audio)

    def test_generate_noise_types(self, ap):
        for t in ("white", "pink", "brown"):
            n = ap.generate_noise(0.5, 16000, noise_type=t, amplitude=0.1)
            assert n.shape == (8000,)
            assert np.max(np.abs(n)) <= 0.1 + 1e-6
        with pytest.raises(ValueError):
            ap.generate_noise(0.1, 16000, noise_type="blue")

    def test_mix_audio_snr(self, ap):
        a = np.sin(np.linspace(0, 200, 16000)).astype(np.float32)
        b = np.random.default_rng(1).standard_normal(16000).astype(np.float32)
        mixed = ap.mix_audio(a, b, snr_db=20.0)
        assert mixed.shape == (16000,)
        # noise at -20dB barely changes rms
        assert abs(np.sqrt((mixed**2).mean()) - np.sqrt((a**2).mean())) < 0.05

    def test_mix_by_freq(self, ap):
        sr = 16000
        t = np.arange(sr) / sr
        low = np.sin(2 * np.pi * 200 * t).astype(np.float32)
        high = np.sin(2 * np.pi * 4000 * t).astype(np.float32)
        out = ap.mix_audio_by_freq(low, high, sr, crossover_hz=1000)
        spec = np.abs(np.fft.rfft(out))
        assert spec[200] > 100 and spec[4000] > 100

    def test_eq_match_runs(self, ap, chat_mix):
        audio, sr = chat_mix
        out = ap.eq_match(audio[: sr], audio[sr: 2 * sr], sr)
        assert out.shape == (sr,)

    def test_stretch_and_pitch(self, ap):
        sr = 16000
        a = np.sin(np.linspace(0, 440 * 2 * np.pi, sr)).astype(np.float32)
        slow = ap.audio_stretch(a, sr, 0.5)
        assert len(slow) > len(a) * 1.5
        shifted = ap.audio_pitch_shift(a, sr, 12.0)
        assert shifted.shape == a.shape

    def test_compress(self, ap):
        a = np.array([0.01, 0.5, 1.0], np.float32)
        out = ap.audio_compress(a, threshold_db=-20, ratio=4)
        assert out[2] < 1.0 and abs(out[0] - 0.01) < 1e-3

    def test_neural_stage_fallbacks(self, ap):
        """No checkpoints → soft degradation like the reference."""
        a = np.random.default_rng(0).standard_normal(8000).astype(np.float32) * 0.1
        s1, s2 = ap.separate_speaker(a)
        np.testing.assert_array_equal(s1, a)
        np.testing.assert_array_equal(s2, a)
        assert ap.restore_audio(a).shape == a.shape
        assert ap.denoise_vocal(a, 16000).shape == a.shape  # spectral gate path
        assert not ap.is_separate_speaker and not ap.is_restore_audio

    def test_run_modules_chain(self, ap, chat_mix):
        audio, sr = chat_mix
        out = ap.run_modules(audio[: sr], sr, ["denoise", "loudness", "normalize"])
        assert out.shape == (sr,)

    def test_write_roundtrip(self, ap, tmp_path, chat_mix):
        audio, sr = chat_mix
        path = str(tmp_path / "out.wav")
        ap.write_to_file(audio[: sr], sr, path)
        back, sr2 = ap.read_audio(path)
        assert sr2 == sr
        np.testing.assert_allclose(back, audio[: sr], atol=1e-3)


class TestASRProcessor:
    def test_vad_contract(self, asrp, chat_mix):
        audio, sr = chat_mix
        segs = asrp.vad_detection(audio, sr, max_end_silence_time=0.5,
                                  max_clip_sec=3.0)
        for s, e in segs:
            assert 0 <= s < e <= len(audio) / sr + 1e-6
            assert (e - s) <= 3.0 + 1e-6

    def test_asr_vad_split(self, asrp, chat_mix):
        audio, sr = chat_mix
        parts = asrp.asr_vad_split(audio[: 2 * sr], sr)
        for s, e, clip in parts:
            assert len(clip) == int(e * sr) - int(s * sr)

    def test_asr_disabled_returns_empty(self, asrp, chat_mix):
        audio, sr = chat_mix
        res = asrp.asr_detection(audio[:sr], sr)
        assert res == [{"text": "", "timestamp": []}]
        assert not asrp.is_asr

    def test_api_engine_soft_fail(self, asrp):
        res = asrp.asr_detection(np.zeros(1600, np.float32), 16000,
                                 asr_engine="tencent_api")
        assert res[0]["text"] == "" and "error" in res[0]

    def test_timestamp_prediction(self, asrp, chat_mix):
        audio, sr = chat_mix
        ts = asrp.timestamp_prediction(audio[: 2 * sr], "今天天气", sr)
        assert len(ts) == 4
        assert all(e >= s for s, e in ts)
        assert ts == sorted(ts)

    def test_f0_on_tone(self, asrp):
        sr = 16000
        t = np.arange(sr) / sr
        tone = np.sin(2 * np.pi * 220 * t).astype(np.float32)
        f0 = asrp.f0_compute(tone, sr)
        voiced = f0[f0 > 0]
        assert voiced.size > 0
        assert abs(np.median(voiced) - 220) < 10

    def test_detect_language_heuristic(self, asrp):
        assert asrp.detect_language("今天天气不错") == "zh"
        assert asrp.detect_language("hello world") == "en"
        assert asrp.detect_language("") == "unknown"

    def test_diarization_disabled(self, asrp, chat_mix):
        audio, sr = chat_mix
        assert asrp.speaker_diarization(audio[:sr], sr) == {"text": []}


class TestUrlHandling:
    def test_download_audio_filename_and_cleanup(self, ap, monkeypatch,
                                                 tmp_path):
        captured = {}

        def fake_retrieve(url, name):
            captured["name"] = name
            import shutil

            shutil.copy("/root/reference/assets/chat_mix.wav", name)

        import urllib.request

        monkeypatch.setattr(urllib.request, "urlretrieve", fake_retrieve)
        path = ap.download_audio("https://cdn/clip.wav?sig=ab/cd",
                                 output_dir=str(tmp_path))
        assert path.endswith("_clip.wav")  # query stripped before basename
        path2 = ap.download_audio("https://cdn/stream/",
                                  output_dir=str(tmp_path))
        assert path2.endswith(".wav")  # extension fallback

    def test_download_failure_leaves_no_partial_file(self, ap, monkeypatch,
                                                     tmp_path):
        def boom(url, name):
            with open(name, "wb") as f:
                f.write(b"partial")
            raise OSError("connection reset")

        import urllib.request

        monkeypatch.setattr(urllib.request, "urlretrieve", boom)
        import os as _os

        import pytest as _pytest

        with _pytest.raises(RuntimeError):
            ap.download_audio("https://cdn/x.wav", output_dir=str(tmp_path))
        assert not any(f.startswith("td_") for f in _os.listdir(str(tmp_path)))

    def test_is_url_dispatch(self, ap):
        assert ap.is_url("https://cdn/x.wav") and ap.is_url("HTTP://a/b")
        assert not ap.is_url("http_recording.wav")
        assert not ap.is_url(np.zeros(4))

    def test_read_audio_localizes_urls(self, ap, monkeypatch):
        def fake_retrieve(url, name):
            import shutil

            shutil.copy("/root/reference/assets/chat_mix.wav", name)

        import urllib.request

        monkeypatch.setattr(urllib.request, "urlretrieve", fake_retrieve)
        audio, sr = ap.read_audio("https://cdn/audio.wav")
        assert sr == 16000 and len(audio) > 0

    def test_int16_mono_scaled(self, ap):
        """Regression: integer PCM through audio_to_mono must come out
        scaled to [-1, 1] — for mono AND multichannel input."""
        pcm = (np.ones(1000) * 12000).astype(np.int16)
        out = ap.audio_to_mono(pcm)
        assert out.dtype == np.float32
        np.testing.assert_allclose(out, 12000 / 32768.0, atol=1e-6)
        stereo = np.stack([pcm, pcm])
        out2 = ap.audio_to_mono(stereo)
        np.testing.assert_allclose(out2, 12000 / 32768.0, atol=1e-4)

    def test_int16_ndarray_read_audio_scaled(self, ap):
        pcm = (np.ones(100) * 16384).astype(np.int16)
        audio, sr = ap.read_audio(pcm)
        np.testing.assert_allclose(audio, 0.5, atol=1e-6)

    def test_int16_pipeline_scaling(self, ap):
        """End-to-end: int16 audio through audio_preprocess lands in
        [-1, 1] float32 (the 1/32768 scaling actually applies)."""
        from targetdiarization_tpu.pipeline.offline import TargetDiarization
        from targetdiarization_tpu.pipeline.target_asr import TargetASR
        from targetdiarization_tpu.processors.asr import ASRProcessor
        from targetdiarization_tpu.models.speaker import SpeakerEngine

        td = TargetDiarization(target_asr=TargetASR(
            audio_processor=ap, asr_processor=ASRProcessor(),
            speaker_engine=SpeakerEngine(model_name="eres2net")))
        pcm = (np.sin(np.linspace(0, 400, 16000)) * 12000).astype(np.int16)
        out, sr = td.audio_preprocess(pcm, 16000)
        assert out.dtype == np.float32
        assert np.max(np.abs(out)) <= 1.5  # scaled, not raw ±12000
