"""Native host runtime tests: build, parity vs jnp, ring buffer."""

import numpy as np
import jax.numpy as jnp
import pytest

from targetdiarization_tpu.utils import native


@pytest.fixture(scope="module")
def lib_available():
    return native.has_native()


class TestPCM:
    def test_roundtrip(self):
        x = np.array([-1.0, -0.5, 0.0, 0.5, 0.999], np.float32)
        pcm = native.f32_to_pcm16(x)
        back = native.pcm16_to_f32(pcm)
        np.testing.assert_allclose(back, x, atol=1e-4)

    def test_clipping(self):
        pcm = native.f32_to_pcm16(np.array([2.0, -2.0], np.float32))
        assert pcm[0] == 32767 and pcm[1] == -32768


class TestLoudnessParity:
    def test_native_matches_jnp(self, lib_available, rng):
        if not lib_available:
            pytest.skip("native lib not built (no compiler)")
        from targetdiarization_tpu.ops.loudness import integrated_loudness

        sr = 16000
        audio = (rng.standard_normal(sr * 3) * 0.1).astype(np.float32)
        ours = native.integrated_loudness_native(audio, sr)
        ref = float(integrated_loudness(jnp.asarray(audio), sr))
        assert abs(ours - ref) < 0.1  # <0.1 LU (SURVEY.md §7.4.7 bar)

    def test_real_audio_parity(self, lib_available, chat_mix):
        if not lib_available:
            pytest.skip("native lib not built")
        from targetdiarization_tpu.ops.loudness import integrated_loudness

        audio, sr = chat_mix
        ours = native.integrated_loudness_native(np.asarray(audio), sr)
        ref = float(integrated_loudness(jnp.asarray(audio), sr))
        assert abs(ours - ref) < 0.1

    def test_silence_is_gated(self, lib_available):
        out = native.integrated_loudness_native(np.zeros(32000, np.float32), 16000)
        assert out == float("-inf")


class TestResample:
    def test_linear_tone(self):
        t = np.linspace(0, 1, 16000, dtype=np.float32)
        x = np.sin(2 * np.pi * 100 * t).astype(np.float32)
        y = native.resample_linear(x, 8000)
        assert y.shape == (8000,)
        # same tone at half the sample count
        np.testing.assert_allclose(y[100], x[200], atol=1e-2)


class TestRingBuffer:
    def test_push_pop_order(self):
        rb = native.RingBuffer(16)
        assert rb.push(np.arange(10, dtype=np.float32)) == 10
        assert len(rb) == 10
        out = rb.pop(4)
        np.testing.assert_array_equal(out, [0, 1, 2, 3])
        assert len(rb) == 6

    def test_capacity_limit(self):
        rb = native.RingBuffer(8)
        wrote = rb.push(np.ones(20, np.float32))
        assert wrote == 8
        assert rb.space() == 0
        rb.pop(8)
        assert rb.space() == 8

    def test_wraparound(self):
        rb = native.RingBuffer(8)
        for rep in range(5):  # repeatedly wrap the indices
            rb.push(np.full(6, rep, np.float32))
            out = rb.pop(6)
            np.testing.assert_array_equal(out, np.full(6, rep, np.float32))


class TestProcessorIntegration:
    def test_meter_loudness_uses_native_path(self, chat_mix):
        from targetdiarization_tpu.processors.audio import AudioProcessor

        audio, sr = chat_mix
        ap = AudioProcessor()
        lufs = ap.meter_loudness(audio, sr)
        assert np.isfinite(lufs) and -70 < lufs < 0
