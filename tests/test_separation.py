"""MossFormer2 separation tests (tiny config for CPU CI)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from targetdiarization_tpu.models.separation import (
    FlashBlock,
    MossFormer2,
    SeparationEngine,
    rope_rotate,
)


def tiny_model(**over):
    kw = dict(dim=32, enc_channels=32, num_blocks=2, group_size=64, qk_dim=32,
              fsmn_inner=16)
    kw.update(over)
    return MossFormer2(**kw)


class TestRope:
    def test_preserves_norm(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 10, 48)), jnp.float32)
        y = rope_rotate(x, rot_dims=32)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(x), axis=-1),
            np.linalg.norm(np.asarray(y), axis=-1),
            rtol=1e-5,
        )

    def test_position_zero_identity(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 5, 32)), jnp.float32)
        y = rope_rotate(x, rot_dims=32)
        np.testing.assert_allclose(np.asarray(x[0, 0]), np.asarray(y[0, 0]), atol=1e-6)


class TestFlashBlock:
    def test_forward_and_mask(self, rng):
        blk = FlashBlock(dim=32, group_size=16, qk_dim=16)
        t = 64
        x = jnp.asarray(rng.standard_normal((1, t, 32)), jnp.float32)
        mask = jnp.ones((1, t))
        params = blk.init(jax.random.PRNGKey(0), x, mask)
        y = blk.apply(params, x, mask)
        assert y.shape == x.shape
        # padded frames stay exactly x (residual with masked update)
        mask2 = jnp.concatenate([jnp.ones((1, 32)), jnp.zeros((1, 32))], axis=1)
        y2 = blk.apply(params, x, mask2)
        np.testing.assert_allclose(
            np.asarray(y2[0, 32:]), np.asarray(x[0, 32:]), atol=1e-6
        )


class TestMossFormer2:
    @pytest.fixture(scope="class")
    def model_and_params(self):
        model = tiny_model()
        wav = jnp.zeros((1, 16 * 64))
        params = model.init(jax.random.PRNGKey(0), wav)
        return model, params

    def test_output_shape(self, model_and_params, rng):
        model, params = model_and_params
        t = 2000
        wav = jnp.asarray(rng.standard_normal((2, t)) * 0.1, jnp.float32)
        est = model.apply(params, wav)
        assert est.shape == (2, 2, t)
        assert np.all(np.isfinite(np.asarray(est)))

    def test_longer_input_same_params(self, model_and_params, rng):
        """Different time buckets reuse the same weights (fully convolutional
        + static-per-bucket groups)."""
        model, params = model_and_params
        for t in (1000, 4096):
            wav = jnp.asarray(rng.standard_normal((1, t)) * 0.1, jnp.float32)
            est = model.apply(params, wav)
            assert est.shape == (1, 2, t)


class TestEngine:
    @pytest.fixture(scope="class")
    def engine(self):
        return SeparationEngine(model=tiny_model(), window=16000, seed=0)

    def test_separate_shapes(self, engine, chat_mix):
        audio, sr = chat_mix
        out = engine.separate(audio[: sr * 2], sr=sr)
        assert out.shape == (2, sr * 2)
        assert np.all(np.isfinite(out))

    def test_loudness_ordering(self, engine, rng):
        out = engine.separate(rng.standard_normal(24000).astype(np.float32) * 0.1)
        from targetdiarization_tpu.ops.loudness import integrated_loudness
        import jax.numpy as jnp

        l0 = float(integrated_loudness(jnp.asarray(out[0]), 16000))
        l1 = float(integrated_loudness(jnp.asarray(out[1]), 16000))
        assert l0 >= l1 - 1e-6

    def test_resample_roundtrip(self, engine, rng):
        audio = rng.standard_normal(44100).astype(np.float32) * 0.1
        out = engine.separate(audio, sr=44100)
        assert out.shape == (2, 44100)

    def test_empty(self, engine):
        out = engine.separate(np.zeros(0, np.float32))
        assert out.shape == (2, 0)


class TestEngineMicrobatch:
    """Cross-session coalescing of the separation dispatch: concurrent
    same-bucket `separate` calls share one batched device program and
    return exactly what a lone caller would get."""

    def test_concurrent_equals_sequential(self, rng):
        from concurrent.futures import ThreadPoolExecutor

        eng = SeparationEngine(model=tiny_model(), window=16000, seed=0)
        clips = [rng.standard_normal(12000).astype(np.float32) * 0.1
                 for _ in range(6)]
        seq = [eng.separate(c) for c in clips]
        with ThreadPoolExecutor(max_workers=6) as ex:
            conc = list(ex.map(eng.separate, clips))
        for a, b in zip(seq, conc):
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)
        assert eng._mb is not None and eng._mb.items >= 6

    def test_row_overflow_bypasses_batcher(self, rng):
        # >top-rung row counts (long audio, many windows) run direct
        eng = SeparationEngine(model=tiny_model(), window=1600, seed=0)
        audio = rng.standard_normal(1600 * 20).astype(np.float32) * 0.1
        before = eng._mb.items if eng._mb else 0
        out = eng.separate(audio)
        assert out.shape == (2, 1600 * 20)
        after = eng._mb.items if eng._mb else 0
        assert after == before  # 20 rows > top rung → no submit

    def test_disabled_env(self, monkeypatch):
        monkeypatch.setenv("TD_MICROBATCH", "0")
        eng = SeparationEngine(model=tiny_model(), window=16000, seed=0)
        assert eng._mb is None
        out = eng.separate(np.zeros(8000, np.float32))
        assert out.shape == (2, 8000)
