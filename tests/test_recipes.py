"""Bootstrap recipe tests (tiny budgets on CPU) + shipped checkpoint."""

import os

import numpy as np
import pytest

from targetdiarization_tpu.train.recipes import bootstrap_vad, bootstrap_separator

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VAD_CKPT = os.path.join(REPO, "checkpoints", "vad-bootstrap")


class TestBootstrapVAD:
    def test_few_steps_run_and_save(self, tmp_path):
        m = bootstrap_vad(steps=5, batch=4, seconds=1.0,
                          checkpoint_dir=str(tmp_path / "vad"),
                          log_fn=lambda *_: None)
        assert np.isfinite(m["final_loss"])
        assert os.path.exists(os.path.join(str(tmp_path / "vad"), "model.json"))

    @pytest.mark.skipif(not os.path.exists(VAD_CKPT),
                        reason="shipped checkpoint absent")
    def test_shipped_checkpoint_discriminates(self, chat_mix, rng):
        """The committed bootstrap VAD actually separates speech from
        noise (trained on TPU; speech prob ≈0.9 vs noise ≈1e-5)."""
        from targetdiarization_tpu.models.vad import VADEngine

        eng = VADEngine.from_pretrained(VAD_CKPT)
        audio, sr = chat_mix
        speech_p = eng.frame_probs(audio[: sr * 2], sr=sr).mean()
        noise = (rng.standard_normal(sr * 2) * 0.05).astype(np.float32)
        noise_p = eng.frame_probs(noise).mean()
        assert speech_p > 0.5
        assert noise_p < 0.2
        assert speech_p > noise_p + 0.5

    @pytest.mark.skipif(not os.path.exists(VAD_CKPT),
                        reason="shipped checkpoint absent")
    def test_shipped_checkpoint_segments_fixture(self, chat_mix):
        from targetdiarization_tpu.models.vad import VADEngine

        eng = VADEngine.from_pretrained(VAD_CKPT)
        audio, sr = chat_mix
        segs = eng.vad_detection(audio, sr=sr)
        assert segs, "speech fixture must yield segments"
        total = sum(e - s for s, e in segs)
        assert total > 2.0  # most of an 8.7 s conversation is speech


class TestBootstrapSeparator:
    def test_few_steps_run_and_save(self, tmp_path):
        from targetdiarization_tpu.models.separation import MossFormer2

        m = bootstrap_separator(
            steps=3, batch=8, seconds=0.2,
            checkpoint_dir=str(tmp_path / "sep"),
            model=MossFormer2(dim=16, enc_channels=16, num_blocks=1,
                              group_size=32, qk_dim=16, kernel_size=8,
                              fsmn_inner=8),
            log_fn=lambda *_: None)
        assert np.isfinite(m["final_loss"])
        # the exported checkpoint loads through the registry
        from targetdiarization_tpu.runtime.registry import from_pretrained

        model, params = from_pretrained(str(tmp_path / "sep"))
        assert type(model).__name__ == "MossFormer2"


class TestRestorerDenoiserRecipes:
    def test_restorer_few_steps_cpu(self, tmp_path):
        from targetdiarization_tpu.train.recipes import bootstrap_restorer

        m = bootstrap_restorer(steps=2, batch=2, seconds=0.5,
                               checkpoint_dir=str(tmp_path / "r"),
                               log_fn=lambda *_: None)
        assert np.isfinite(m["final_loss"])
        # exported checkpoint loads via the registry as an Apollo
        from targetdiarization_tpu.runtime.registry import from_pretrained

        model, _ = from_pretrained(str(tmp_path / "r"))
        assert type(model).__name__ == "Apollo"
