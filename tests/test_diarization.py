"""Diarization engine tests: segmentation net, binarization, clustering."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from targetdiarization_tpu.models.diarization import (
    BinarizeConfig,
    ClusterDiarizer,
    DiarizeConfig,
    SegmentationEngine,
    SegmentationNet,
)


class TestSegmentationNet:
    def test_forward_shape(self, rng):
        net = SegmentationNet(n_layers=1)
        feats = jnp.asarray(rng.standard_normal((2, 200, 80)), jnp.float32)
        params = net.init(jax.random.PRNGKey(0), feats, jnp.array([200, 100]))
        act = net.apply(params, feats, jnp.array([200, 100]))
        assert act.shape == (2, 50, 3)
        a = np.asarray(act)
        assert np.all((a >= 0) & (a <= 1))

    def test_mask_zeroes_padding(self, rng):
        net = SegmentationNet(n_layers=1)
        feats = jnp.asarray(rng.standard_normal((1, 200, 80)), jnp.float32)
        params = net.init(jax.random.PRNGKey(0), feats, jnp.array([80]))
        act = np.asarray(net.apply(params, feats, jnp.array([80])))
        # frames beyond 80//4=20 are masked to exactly zero
        assert np.all(act[0, 20:] == 0)


class TestSegmentationEngine:
    @pytest.fixture(scope="class")
    def engine(self):
        return SegmentationEngine(model=SegmentationNet(n_layers=1), seed=0)

    def test_activations(self, engine, chat_mix):
        audio, sr = chat_mix
        act = engine.activations(audio[: sr * 2], sr=sr)
        assert act.shape[1] == 3 and act.shape[0] > 0

    def test_diarize_and_overlap_types(self, engine, chat_mix):
        audio, sr = chat_mix
        sd = engine.diarize(audio[: sr * 4], sr=sr)
        assert isinstance(sd, dict)
        for ranges in sd.values():
            for s, e in ranges:
                assert e > s
        od = engine.detect_overlap(audio[: sr * 4], sr=sr)
        assert isinstance(od, dict)
        assert engine.is_overlap(audio[: sr * 4], sr=sr) == bool(od)

    def test_empty_audio(self, engine):
        assert engine.diarize(np.zeros(0, np.float32)) == {}


class _FakeSpeakerEngine:
    """Deterministic embeddings: direction flips every 3 s of audio
    midpoint — simulates two speakers alternating."""

    def embed_batch(self, clips, sr=16000):
        out = []
        for i, c in enumerate(clips):
            v = np.zeros(8, np.float32)
            v[0 if (len(c) and i % 4 < 2) else 1] = 1.0
            out.append(v)
        return np.stack(out) if out else np.zeros((0, 8), np.float32)


class TestClusterDiarizer:
    def test_two_clusters_found(self):
        diar = ClusterDiarizer(
            _FakeSpeakerEngine(), vad_engine=None,
            cfg=DiarizeConfig(clustering_threshold=0.5),
        )
        audio = np.zeros(16000 * 6, np.float32)
        sd = diar.diarize(audio)
        assert set(sd) == {"0", "1"}
        # labels ordered by first appearance
        assert sd["0"][0][0] <= sd["1"][0][0]

    def test_known_speaker_count(self):
        diar = ClusterDiarizer(_FakeSpeakerEngine(), vad_engine=None)
        audio = np.zeros(16000 * 6, np.float32)
        sd = diar.diarize(audio, n_speakers=1)
        assert set(sd) == {"0"}

    def test_empty(self):
        diar = ClusterDiarizer(_FakeSpeakerEngine())
        assert diar.diarize(np.zeros(100, np.float32)) == {}
