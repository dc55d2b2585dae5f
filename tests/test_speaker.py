"""Speaker-embedding model + engine tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from targetdiarization_tpu.models.speaker import (
    CAMPlusPlus,
    ERes2NetV2,
    SpeakerEngine,
    cosine_similarity,
    EMBED_DIM,
)


class TestCosine:
    def test_identical(self):
        e = np.random.default_rng(0).standard_normal(192)
        assert abs(cosine_similarity(e, e) - 1.0) < 1e-9

    def test_orthogonal_and_zero(self):
        assert cosine_similarity([1, 0], [0, 1]) == 0.0
        assert cosine_similarity(np.zeros(4), np.ones(4)) == 0.0


class TestModels:
    @pytest.mark.parametrize("cls", [ERes2NetV2, CAMPlusPlus])
    def test_forward_shape(self, cls, rng):
        model = cls()
        feats = jnp.asarray(rng.standard_normal((2, 120, 80)), jnp.float32)
        lengths = jnp.array([120, 80])
        params = model.init(jax.random.PRNGKey(0), feats, lengths)
        emb = model.apply(params, feats, lengths)
        assert emb.shape == (2, EMBED_DIM)
        assert np.all(np.isfinite(np.asarray(emb)))

    def test_mask_effect(self, rng):
        """Embedding of a short segment inside a padded batch should be
        close to the same segment alone (masked pooling discipline)."""
        model = CAMPlusPlus(block_layers=(2, 2))
        f = jnp.asarray(rng.standard_normal((1, 60, 80)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), f, jnp.array([60]))
        e_alone = model.apply(params, f, jnp.array([60]))
        f_pad = jnp.pad(f, ((0, 0), (0, 60), (0, 0)))
        e_padded = model.apply(params, f_pad, jnp.array([60]))
        sim = cosine_similarity(np.asarray(e_alone[0]), np.asarray(e_padded[0]))
        assert sim > 0.99


class TestEngine:
    @pytest.fixture(scope="class")
    def engine(self):
        # small preset keeps CI fast
        return SpeakerEngine(model_name="eres2net", seed=0)

    def test_single_embedding(self, engine, female_a):
        audio, sr = female_a
        emb = engine.get_speaker_embedding(audio, sr=sr)
        assert emb.shape == (EMBED_DIM,)
        assert np.linalg.norm(emb) > 0

    def test_zero_fallback_on_tiny_input(self, engine):
        emb = engine.get_speaker_embedding(np.zeros(10, np.float32))
        np.testing.assert_array_equal(emb, np.zeros(EMBED_DIM))

    def test_batch_matches_single(self, engine, rng):
        a1 = rng.standard_normal(16000).astype(np.float32) * 0.1
        a2 = rng.standard_normal(32000).astype(np.float32) * 0.1
        batch = engine.embed_batch([a1, a2])
        single = engine.get_speaker_embedding(a1)
        np.testing.assert_allclose(batch[0], single, atol=1e-4)

    def test_self_similarity_exceeds_cross(self, engine, female_a, chat_mix):
        """Even untrained, the same audio must match itself."""
        audio, sr = female_a
        e1 = engine.get_speaker_embedding(audio, sr=sr)
        same, score = engine.is_same_person(e1, e1, threshold=0.4)
        assert same and abs(score - 1.0) < 1e-6

    def test_get_target_embedding(self, engine, chat_mix):
        audio, sr = chat_mix
        segs = [[0.0, 1.0], [1.0, 2.2], [2.5, 4.0], [4.0, 6.0], [6.0, 8.0]]
        emb = engine.get_target_embedding(audio, sr=sr, vad_segments=segs)
        assert emb.shape == (EMBED_DIM,)
        assert np.all(np.isfinite(emb))

    def test_get_target_embedding_no_segments(self, engine, female_a):
        audio, sr = female_a
        emb = engine.get_target_embedding(audio[: sr * 2], sr=sr)
        assert np.linalg.norm(emb) > 0
