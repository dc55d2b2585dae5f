"""FSMN-VAD tests: features, model masking, state machine, engine API."""

import numpy as np
import jax.numpy as jnp
import pytest

from targetdiarization_tpu.models import features
from targetdiarization_tpu.models.vad import (
    FsmnVADNet,
    VADConfig,
    VADEngine,
    merge_short_clips,
    segment_probs,
    split_long_clips,
)


class TestFeatures:
    def test_fbank_shape(self):
        audio = jnp.zeros(16000)
        f = features.fbank(audio)
        assert f.shape == (features.num_frames(16000), 80)
        assert f.shape[0] == 98  # (16000-400)//160 + 1

    def test_lfr_shape_and_content(self):
        x = jnp.arange(10, dtype=jnp.float32)[:, None] * jnp.ones((10, 3))
        y = features.lfr(x, m=5, n=3)
        assert y.shape == (4, 15)
        # first output stacks [0,0,0,1,2] (left edge-pad by (m-1)//2=2)
        np.testing.assert_allclose(np.asarray(y[0, ::3]), [0, 0, 0, 1, 2])

    def test_cmvn_identity(self):
        mean, istd = features.default_cmvn(4)
        x = jnp.ones((2, 4))
        np.testing.assert_allclose(
            np.asarray(features.apply_cmvn(x, mean, istd)), np.ones((2, 4))
        )


class TestModelMasking:
    def test_padding_invariance(self, rng):
        """Valid-frame outputs must not change when bucket padding grows
        (SURVEY.md §7.4.2 exact-mask rule), outside the right-context."""
        import jax

        net = FsmnVADNet(n_layers=2)
        t = 50
        feats = jnp.asarray(rng.standard_normal((1, t, 80)), jnp.float32)
        params = net.init(jax.random.PRNGKey(0), feats, jnp.array([t]))
        out_a = net.apply(params, feats, jnp.array([t]))
        padded = jnp.pad(feats, ((0, 0), (0, 30), (0, 0)))
        out_b = net.apply(params, padded, jnp.array([t]))
        np.testing.assert_allclose(
            np.asarray(out_a[0, :t]), np.asarray(out_b[0, :t]), atol=1e-5
        )


class TestStateMachine:
    def test_simple_segment(self):
        probs = np.concatenate([np.zeros(50), np.ones(100), np.zeros(100)])
        cfg = VADConfig(speech_pad=0.0, max_end_silence_time=0.2)
        segs = segment_probs(probs, cfg)
        assert len(segs) == 1
        s, e = segs[0]
        assert abs(s - 0.5) < 0.02 and abs(e - 1.5) < 0.02

    def test_silence_gap_splits(self):
        probs = np.concatenate(
            [np.ones(100), np.zeros(120), np.ones(100)]
        )
        cfg = VADConfig(speech_pad=0.0, max_end_silence_time=0.8)
        segs = segment_probs(probs, cfg)
        # 1.2 s silence exceeds 0.8 s → two segments
        assert len(segs) == 2

    def test_short_blip_dropped(self):
        probs = np.concatenate([np.zeros(50), np.ones(5), np.zeros(200)])
        cfg = VADConfig(speech_pad=0.0, min_speech_duration=0.1)
        assert segment_probs(probs, cfg) == []

    def test_merge_short_clips(self):
        segs = [[0.0, 0.2], [0.5, 3.0], [3.5, 3.6]]
        out = merge_short_clips(segs, 0.5)
        assert out == [[0.0, 3.0], [3.5, 3.6]] or out[0][1] >= 3.0

    def test_split_long_clips(self):
        out = split_long_clips([[0.0, 10.0]], 4.0)
        assert len(out) == 3
        assert abs(out[-1][1] - 10.0) < 1e-9
        assert all((e - s) <= 4.0 + 1e-9 for s, e in out)


class TestEngine:
    @pytest.fixture(scope="class")
    def engine(self):
        return VADEngine(seed=0)

    def test_frame_probs_shape(self, engine, chat_mix):
        audio, sr = chat_mix
        probs = engine.frame_probs(audio[: sr * 2], sr=sr)
        assert probs.shape == (features.num_frames(sr * 2),)
        assert np.all((probs >= 0) & (probs <= 1))

    def test_bucketing_consistency(self, engine, rng):
        """Same audio through different bucket paddings → same probs."""
        audio = rng.standard_normal(16000 * 3).astype(np.float32) * 0.1
        p1 = engine.frame_probs(audio)
        p2 = engine.frame_probs(np.concatenate([audio, np.zeros(16000, np.float32)]))
        rc = engine.model.right_context
        np.testing.assert_allclose(p1[: len(p1) - rc], p2[: len(p1) - rc], atol=1e-5)

    def test_speech_timestamps_api(self, engine, chat_mix):
        audio, sr = chat_mix
        ts = engine.get_speech_timestamps(audio[: sr * 2], sr=sr)
        for t in ts:
            assert set(t) == {"start", "end"} and t["end"] > t["start"]
