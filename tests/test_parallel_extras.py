"""Coverage for the remaining parallel/runtime paths: pjit inference
sharding and the orbax checkpoint route."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from targetdiarization_tpu.parallel import make_mesh
from targetdiarization_tpu.parallel.mesh import pjit_forward


class TestPjitForward:
    def test_batch_sharded_inference_matches_single_device(self, rng):
        """Replicated params + batch-sharded input: the DP inference
        scaling path (SURVEY.md §2.4 plan (b))."""
        mesh = make_mesh()
        w = jnp.asarray(rng.standard_normal((8, 4)), jnp.float32)

        def forward(params, x):
            return jnp.tanh(x @ params)

        run = pjit_forward(forward, mesh)
        x = jnp.asarray(rng.standard_normal((16, 8)), jnp.float32)
        out = run(w, x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(forward(w, x)), atol=1e-6)
        # output carries the batch sharding over all 8 devices
        assert len(out.sharding.device_set) == 8


class TestOrbaxRoute:
    def test_orbax_save_and_registry_restore(self, tmp_path):
        from targetdiarization_tpu.runtime.params import (
            load_checkpoint,
            save_checkpoint_orbax,
        )

        params = {"layer": {"w": jnp.ones((3, 4)), "b": jnp.zeros(4)}}
        path = str(tmp_path / "ock")
        save_checkpoint_orbax(path, params, "DemoOrbax", {"dim": 4})
        loaded, meta = load_checkpoint(path)
        assert meta["model_name"] == "DemoOrbax"
        np.testing.assert_array_equal(
            np.asarray(loaded["layer"]["w"]), np.ones((3, 4)))


class TestSeparationEngineMesh:
    """VERDICT r2 ask 5b: a REAL engine batch-sharded over the virtual
    mesh, not a toy matmul."""

    def test_engine_batch_inference_sharded_matches_single(self, rng):
        from targetdiarization_tpu.models.separation import (
            MossFormer2, SeparationEngine)

        model = MossFormer2(dim=16, enc_channels=16, num_blocks=1,
                            group_size=32, qk_dim=16, kernel_size=8,
                            fsmn_inner=8)
        mesh = make_mesh()
        multi = SeparationEngine(model=model, window=4000,
                                 compute_dtype="float32", mesh=mesh)
        single = SeparationEngine(params=multi.params, model=model,
                                  window=4000, compute_dtype="float32")
        # 5 clips (not a mesh multiple): exercises row padding
        clips = [rng.standard_normal(2000 + 300 * i).astype(np.float32) * 0.1
                 for i in range(5)]
        outs_m = multi.separate_batch(clips)
        outs_s = single.separate_batch(clips)
        for om, os_ in zip(outs_m, outs_s):
            assert om.shape == os_.shape
            np.testing.assert_allclose(om, os_, atol=2e-4)

    def test_engine_windowed_path_sharded(self, rng):
        from targetdiarization_tpu.models.separation import (
            MossFormer2, SeparationEngine)

        model = MossFormer2(dim=16, enc_channels=16, num_blocks=1,
                            group_size=32, qk_dim=16, kernel_size=8,
                            fsmn_inner=8)
        mesh = make_mesh()
        eng = SeparationEngine(model=model, window=4000,
                               compute_dtype="float32", mesh=mesh)
        # 3 windows -> padded to 8 rows on the mesh
        audio = rng.standard_normal(11000).astype(np.float32) * 0.1
        out = eng.separate(audio)
        assert out.shape == (2, 11000)
        assert np.isfinite(out).all()
