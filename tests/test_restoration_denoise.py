"""Apollo restoration + MDX denoise tests (tiny configs for CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from targetdiarization_tpu.models.restoration import Apollo, RestorationEngine
from targetdiarization_tpu.models.denoise import (
    DIM_F,
    DIM_T,
    DenoiseEngine,
    TDFUNet,
    mdx_chunk_size,
    mdx_istft,
    mdx_stft,
    spectral_gate,
)


def tiny_apollo():
    # sr=8000, win=20ms → win=160, enc_dim=81, bw=1, tail=81-79=2
    return Apollo(sr=8000, win_ms=20, feature_dim=16, layer=1)


class TestApollo:
    @pytest.fixture(scope="class")
    def model_and_params(self):
        m = tiny_apollo()
        wav = jnp.zeros((1, 8000))
        params = m.init(jax.random.PRNGKey(0), wav)
        return m, params

    def test_roundtrip_shape(self, model_and_params, rng):
        m, params = model_and_params
        wav = jnp.asarray(rng.standard_normal((2, 4000)) * 0.1, jnp.float32)
        out = m.apply(params, wav)
        assert out.shape == (2, 4000)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_band_partition_covers_spectrum(self):
        m = tiny_apollo()
        bw, n_uni, tail = m._bands()
        assert bw * n_uni + tail == m.enc_dim
        assert tail > 0

    def test_default_band_layout_matches_reference(self):
        m = Apollo()
        bw, n_uni, tail = m._bands()
        # reference: 79 bands of width 5 + ragged 47 (apollo.py:226-229)
        assert (bw, n_uni, tail) == (5, 79, 47)
        assert m.win == 882 and m.enc_dim == 442

    def test_engine_restore(self, rng):
        m = tiny_apollo()
        eng = RestorationEngine(model=m, window_s=0.5, hop_s=0.25)
        audio = rng.standard_normal(8000).astype(np.float32) * 0.1
        out = eng.restore(audio, sr=8000)
        assert out.shape == audio.shape
        out2 = eng.restore(audio[:4000], sr=16000)  # resample path
        assert out2.shape == (4000,)


class TestMdxStft:
    def test_pack_roundtrip(self, rng):
        hop = 1024
        wav = rng.standard_normal((2, 2, mdx_chunk_size(hop))).astype(np.float32)
        packed = mdx_stft(jnp.asarray(wav), hop)
        assert packed.shape == (2, 4, DIM_F, DIM_T)
        back = mdx_istft(packed, hop)
        # DIM_F crop discards 1 of 3073 bins: white-noise crop loss is
        # RMS ≈ sqrt(1/3073) ≈ 0.018 → mean|err| ≈ 0.008
        err = np.abs(np.asarray(back) - wav).mean()
        assert err < 0.02
        corr = np.corrcoef(np.asarray(back).ravel(), wav.ravel())[0, 1]
        assert corr > 0.999

    def test_chunk_size(self):
        assert mdx_chunk_size(1024) == 1024 * 255


class TestTDFUNet:
    def test_forward(self, rng):
        net = TDFUNet(channels=4, depth=2, growth=2)
        x = jnp.asarray(rng.standard_normal((1, 4, 64, 16)), jnp.float32)
        params = net.init(jax.random.PRNGKey(0), x)
        y = net.apply(params, x)
        assert y.shape == x.shape


class TestSpectralGate:
    def test_reduces_noise_floor(self, rng):
        sr = 16000
        t = np.arange(sr) / sr
        tone = 0.5 * np.sin(2 * np.pi * 440 * t)
        noise = rng.standard_normal(sr) * 0.01
        noisy = (tone + noise).astype(np.float32)
        out = np.asarray(spectral_gate(jnp.asarray(noisy)))
        assert out.shape == noisy.shape
        # silence-only regions of the spectrum are attenuated: total noise
        # energy outside the tone band decreases
        from numpy.fft import rfft

        spec_in = np.abs(rfft(noisy))
        spec_out = np.abs(rfft(out))
        band = slice(500, 7000)  # well above the 440 Hz tone bin
        assert spec_out[band].sum() < spec_in[band].sum()


class TestDenoiseEngine:
    def test_fast_mode(self, rng):
        eng = DenoiseEngine(model=TDFUNet(channels=4, depth=2, growth=2))
        audio = rng.standard_normal(16000).astype(np.float32) * 0.1
        out = eng.denoise_vocal(audio, sr=16000, fast_mode=True)
        assert out.shape == audio.shape

    @pytest.mark.slow
    def test_mdx_path(self, rng):
        eng = DenoiseEngine(model=TDFUNet(channels=4, depth=2, growth=2))
        audio = rng.standard_normal(16000).astype(np.float32) * 0.1
        out = eng.denoise_vocal(audio, sr=16000)
        assert out.shape == audio.shape
        assert np.all(np.isfinite(out))
