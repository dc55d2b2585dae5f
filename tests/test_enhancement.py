"""FlowEnhancer (Resemble-Enhance slot) + MOS estimator coverage."""

import numpy as np
import pytest


class TestEnhancerEngine:
    @pytest.fixture(scope="class")
    def engine(self):
        from targetdiarization_tpu.models.enhancement import (
            EnhancerEngine, FlowEnhancer)

        return EnhancerEngine(model=FlowEnhancer(ch=16))

    def test_enhance_shapes_and_finiteness(self, engine, rng):
        audio = rng.standard_normal(12000).astype(np.float32) * 0.1
        out = engine.enhance(audio, sr=16000, nfe=2)
        assert out.shape == audio.shape
        assert out.dtype == np.float32
        assert np.isfinite(out).all()

    def test_nfe_knob_changes_output(self, engine, rng):
        """The quality knob must actually change the ODE solve."""
        audio = rng.standard_normal(8000).astype(np.float32) * 0.1
        a = engine.enhance(audio, sr=16000, nfe=1)
        b = engine.enhance(audio, sr=16000, nfe=4)
        assert not np.allclose(a, b)

    def test_lambd_zero_is_passthrough_magnitude(self, engine, rng):
        """lambd=0 blends fully toward the input magnitude: output must
        reconstruct the input closely (phase is reused)."""
        audio = rng.standard_normal(8000).astype(np.float32) * 0.1
        out = engine.enhance(audio, sr=16000, nfe=1, lambd=0.0)
        err = np.abs(out - audio).mean() / (np.abs(audio).mean() + 1e-9)
        assert err < 0.05, err

    def test_processor_slot_fallback(self):
        """Without an enhancer checkpoint the slot soft-degrades to the
        restorer path (reference DISABLED_PACKAGES behavior)."""
        from targetdiarization_tpu.processors.audio import AudioProcessor

        ap = AudioProcessor()
        x = np.zeros(1600, np.float32)
        out = ap.enhance_audio(x, 16000)
        assert out.shape == x.shape


class TestMOSEstimator:
    def test_dnsmos_harness_contract(self, rng):
        from targetdiarization_tpu.train.mos import MOSEstimator

        est = MOSEstimator()
        audio = rng.standard_normal(16000 * 2).astype(np.float32) * 0.1
        d = est(audio, 16000)
        for k in ("OVRL", "SIG", "BAK", "P808_MOS", "OVRL_raw", "num_hops"):
            assert k in d
        assert d["num_hops"] >= 1
        assert np.isfinite(d["OVRL"])

    def test_sigmos_frontend_shape(self, rng):
        from targetdiarization_tpu.train.mos import sigmos_frontend

        f = sigmos_frontend(rng.standard_normal(16000).astype(np.float32),
                            16000)
        assert f.shape[-1] == 481  # 960-point rfft bins
        assert f.shape[0] == 3  # compressed mag + compressed real/imag
        assert np.isfinite(f).all()

    def test_sigmos_frontend_channels(self, rng):
        """mag channel = |compressed complex channels| (the reference's
        compressed_mag_complex invariant |X|^c = |(|X|^(c-1)·X)|)."""
        from targetdiarization_tpu.train.mos import sigmos_frontend

        f = sigmos_frontend(rng.standard_normal(48000).astype(np.float32),
                            48000)
        mag = np.hypot(f[1], f[2])
        np.testing.assert_allclose(mag, f[0], rtol=1e-4, atol=1e-5)

    def test_sigmos_harness_contract(self, rng):
        from targetdiarization_tpu.train.mos import SigMOSEstimator

        est = SigMOSEstimator()
        d = est.run(rng.standard_normal(16000).astype(np.float32) * 0.1,
                    sr=16000)
        assert set(d) == set(SigMOSEstimator.KEYS)
        assert all(np.isfinite(v) for v in d.values())
