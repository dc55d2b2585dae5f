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
