"""DSP kernel parity tests vs scipy/numpy references."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal

from targetdiarization_tpu.ops import (
    audio as aops,
)
from targetdiarization_tpu.ops.chunk import chunk_signal, merge_chunks
from targetdiarization_tpu.ops.loudness import integrated_loudness, normalize_loudness
from targetdiarization_tpu.ops.mel import log_mel_spectrogram, mel_filterbank
from targetdiarization_tpu.ops.resample import resample
from targetdiarization_tpu.ops.stft import (
    frame_signal,
    hann_window,
    istft,
    overlap_add,
    stft,
)


class TestResample:
    @pytest.mark.parametrize("pair", [(16000, 44100), (44100, 16000), (16000, 8000)])
    def test_matches_scipy(self, rng, pair):
        target, source = pair
        x = rng.standard_normal(source).astype(np.float32)  # 1 s
        got = np.asarray(resample(jnp.asarray(x), target, source))
        import math

        g = math.gcd(target, source)
        want = scipy.signal.resample_poly(x, target // g, source // g)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_identity(self, rng):
        x = rng.standard_normal(1000).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(resample(x, 16000, 16000)), x)

    def test_multichannel(self, rng):
        x = rng.standard_normal((2, 8000)).astype(np.float32)
        got = np.asarray(resample(jnp.asarray(x), 16000, 8000))
        assert got.shape == (2, 16000)


class TestSTFT:
    def test_frame_overlap_add_roundtrip(self, rng):
        x = rng.standard_normal(1600).astype(np.float32)
        frames = frame_signal(jnp.asarray(x), 400, 400)
        y = np.asarray(overlap_add(frames, 400))
        np.testing.assert_allclose(y, x[: len(y)], atol=1e-6)

    def test_stft_matches_scipy(self, rng):
        n_fft, hop = 512, 128
        x = rng.standard_normal(4096).astype(np.float32)
        got = np.asarray(stft(jnp.asarray(x), n_fft, hop))
        # scipy ShortTimeFFT equivalent: manual framing check on a frame
        win = np.asarray(hann_window(n_fft))
        xp = np.pad(x, (n_fft // 2, n_fft // 2), mode="reflect")
        f0 = np.fft.rfft(xp[:n_fft] * win)
        np.testing.assert_allclose(got[:, 0], f0, atol=1e-3)
        f3 = np.fft.rfft(xp[3 * hop : 3 * hop + n_fft] * win)
        np.testing.assert_allclose(got[:, 3], f3, atol=1e-3)

    @pytest.mark.parametrize("n_fft,hop", [(512, 128), (400, 100), (1024, 256)])
    def test_roundtrip(self, rng, n_fft, hop):
        x = rng.standard_normal(8000).astype(np.float32)
        spec = stft(jnp.asarray(x), n_fft, hop)
        y = np.asarray(istft(spec, n_fft, hop, length=len(x)))
        np.testing.assert_allclose(y, x, atol=1e-4)

    def test_batched(self, rng):
        x = rng.standard_normal((3, 4000)).astype(np.float32)
        spec = stft(jnp.asarray(x), 512, 160)
        assert spec.shape[0] == 3
        y = np.asarray(istft(spec, 512, 160, length=4000))
        np.testing.assert_allclose(y, x, atol=1e-4)


class TestLoudness:
    def _reference_lufs(self, x, sr):
        """Independent float64 BS.1770 implementation (scipy sosfilt)."""
        from targetdiarization_tpu.ops.loudness import _k_weighting_sos

        sos = _k_weighting_sos(sr)
        y = x.astype(np.float64)
        for sec in sos:
            y = scipy.signal.lfilter(sec[:3], sec[3:], y)
        t_g, hop = int(0.4 * sr), int(0.1 * sr)
        n_blocks = (len(y) - t_g) // hop + 1
        z = np.array(
            [np.mean(y[i * hop : i * hop + t_g] ** 2) for i in range(n_blocks)]
        )
        l = -0.691 + 10 * np.log10(np.maximum(z, 1e-30))
        m = l > -70
        if not m.any():
            return -np.inf
        gamma = -0.691 + 10 * np.log10(z[m].mean()) - 10
        m2 = m & (l > gamma)
        return -0.691 + 10 * np.log10(z[m2].mean())

    def test_matches_reference_impl(self, chat_mix):
        x, sr = chat_mix
        got = float(integrated_loudness(jnp.asarray(x), sr))
        want = self._reference_lufs(x, sr)
        assert abs(got - want) < 0.1  # <0.1 LU target (SURVEY §7.4)

    def test_sine_loudness(self):
        # 997 Hz full-scale sine @ 48k should measure ≈ -3.01 LUFS
        sr = 48000
        t = np.arange(sr * 3) / sr
        x = np.sin(2 * np.pi * 997 * t).astype(np.float32)
        got = float(integrated_loudness(jnp.asarray(x), sr))
        assert abs(got - (-3.01)) < 0.15

    def test_normalize(self, chat_mix):
        x, sr = chat_mix
        y = normalize_loudness(jnp.asarray(x), sr, target_lufs=-23.0)
        got = float(integrated_loudness(y, sr))
        assert abs(got - (-23.0)) < 0.3

    def test_silence_is_safe(self):
        x = jnp.zeros(16000 * 2)
        y = normalize_loudness(x, 16000)
        assert np.isfinite(np.asarray(y)).all()


class TestChunk:
    def test_roundtrip_rect(self, rng):
        x = rng.standard_normal(45000).astype(np.float32)
        chunks, n = chunk_signal(jnp.asarray(x), 16000, 8000)
        y = np.asarray(merge_chunks(chunks, n, 8000))
        np.testing.assert_allclose(y, x, atol=1e-6)

    def test_roundtrip_tri(self, rng):
        x = rng.standard_normal(45000).astype(np.float32)
        chunks, n = chunk_signal(jnp.asarray(x), 16000, 4000)
        y = np.asarray(merge_chunks(chunks, n, 4000, window_fn="tri"))
        np.testing.assert_allclose(y, x, atol=1e-5)

    def test_short_signal(self, rng):
        x = rng.standard_normal(100).astype(np.float32)
        chunks, n = chunk_signal(jnp.asarray(x), 16000)
        assert chunks.shape == (1, 16000)
        y = np.asarray(merge_chunks(chunks, n))
        np.testing.assert_allclose(y, x, atol=1e-6)


class TestAudioOps:
    def test_mono_stereo(self, rng):
        x = rng.standard_normal((2, 100)).astype(np.float32)
        m = np.asarray(aops.to_mono(jnp.asarray(x)))
        np.testing.assert_allclose(m, x.mean(0), atol=1e-6)

    def test_gain_db(self):
        x = jnp.ones(10)
        y = np.asarray(aops.apply_gain_db(x, 6.0))
        np.testing.assert_allclose(y, 10 ** (6 / 20), rtol=1e-6)

    def test_peak_normalize(self, rng):
        x = rng.standard_normal(1000).astype(np.float32) * 0.1
        y = np.asarray(aops.peak_normalize(jnp.asarray(x), -1.0))
        np.testing.assert_allclose(np.abs(y).max(), 10 ** (-1 / 20), rtol=1e-5)

    def test_mix_snr(self, rng):
        a = rng.standard_normal(16000).astype(np.float32)
        b = rng.standard_normal(16000).astype(np.float32)
        mixed = np.asarray(aops.mix_audio(jnp.asarray(a), jnp.asarray(b), snr_db=10.0))
        noise = mixed - a
        snr = 20 * np.log10(np.std(a) / np.std(noise))
        assert abs(snr - 10.0) < 0.1


class TestMel:
    def test_filterbank_shape_and_partition(self):
        fb = np.asarray(mel_filterbank(16000, 512, 80))
        assert fb.shape == (80, 257)
        assert (fb >= 0).all()
        assert fb.sum(axis=1).min() > 0  # every filter non-empty

    def test_logmel_shape(self, chat_mix):
        x, sr = chat_mix
        feats = log_mel_spectrogram(jnp.asarray(x) * 32768.0, sr)
        n_frames = 1 + (len(x) - 400) // 160
        assert feats.shape == (n_frames, 80)
        assert np.isfinite(np.asarray(feats)).all()
