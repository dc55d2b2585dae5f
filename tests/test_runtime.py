"""Runtime layer tests: buckets, param store, registry, mesh helpers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from targetdiarization_tpu.runtime import (
    BucketLadder,
    pad_to,
    pad_to_bucket,
    length_mask,
    save_checkpoint,
    load_checkpoint,
    from_pretrained,
    register_model,
    param_count,
    tree_cast,
)
from targetdiarization_tpu.runtime.buckets import masked_mean
from targetdiarization_tpu.parallel import (
    make_mesh,
    shard_batch,
    data_parallel_step,
)


class TestBuckets:
    def test_bucket_selection(self):
        ladder = BucketLadder.from_seconds((1, 2, 4), sr=10)
        assert ladder.bucket(5) == 10
        assert ladder.bucket(10) == 10
        assert ladder.bucket(11) == 20
        assert ladder.bucket(999) == 40  # clamps to top

    def test_split_plan_covers(self):
        ladder = BucketLadder.from_seconds((1, 2, 4), sr=10)
        plan = ladder.split_plan(95)
        assert sum(plan) >= 95
        assert plan[:-1] == [40, 40]

    def test_pad_to_bucket(self):
        ladder = BucketLadder.from_seconds((1, 2), sr=100)
        x = np.ones(150, np.float32)
        padded, n = pad_to_bucket(x, ladder)
        assert padded.shape == (200,) and n == 150
        assert padded[150:].sum() == 0

    def test_pad_to_rejects_overflow(self):
        with pytest.raises(ValueError):
            pad_to(np.ones(5), 3)

    def test_length_mask(self):
        m = length_mask(jnp.array([2, 4]), 4)
        np.testing.assert_array_equal(
            np.asarray(m), [[1, 1, 0, 0], [1, 1, 1, 1]]
        )

    def test_masked_mean_ignores_padding(self):
        x = jnp.array([[1.0, 2.0, 99.0, 99.0]])
        m = length_mask(jnp.array([2]), 4)
        got = masked_mean(x, m, axis=-1)
        np.testing.assert_allclose(np.asarray(got), [1.5])


class TestParamStore:
    def test_roundtrip(self, tmp_path):
        params = {"layer": {"w": jnp.ones((3, 4)), "b": jnp.zeros(4)}}
        save_checkpoint(str(tmp_path / "ckpt"), params, "DemoNet", {"dim": 4})
        loaded, meta = load_checkpoint(str(tmp_path / "ckpt"))
        assert meta["model_name"] == "DemoNet"
        assert meta["model_args"] == {"dim": 4}
        np.testing.assert_array_equal(np.asarray(loaded["layer"]["w"]), np.ones((3, 4)))

    def test_param_count_and_cast(self):
        params = {"w": jnp.ones((3, 4)), "b": jnp.zeros(4)}
        assert param_count(params) == 16
        cast = tree_cast(params, jnp.bfloat16)
        assert cast["w"].dtype == jnp.bfloat16


class TestRegistry:
    def test_checkpoint_dispatch(self, tmp_path):
        @register_model(name="TinyNetForTest")
        class TinyNet:
            def __init__(self, dim=2):
                self.dim = dim

        params = {"w": jnp.ones((2, 2))}
        save_checkpoint(str(tmp_path / "c"), params, "TinyNetForTest", {"dim": 7})
        model, loaded = from_pretrained(str(tmp_path / "c"))
        # dispatch is on the checkpoint's model_name, not the call site
        assert type(model).__name__ == "TinyNet" and model.dim == 7


class TestMesh:
    def test_mesh_has_8_virtual_devices(self):
        mesh = make_mesh()
        assert mesh.devices.size == 8

    def test_shard_batch_and_dp_step(self):
        mesh = make_mesh()
        params = {"w": jnp.full((4,), 2.0)}

        def step(state, batch):
            # toy "training step": grad of mean((x*w)^2) wrt w, sgd
            def loss(w):
                return jnp.mean((batch["x"] * w["w"]) ** 2)

            g = jax.grad(loss)(state)
            new = {"w": state["w"] - 0.1 * g["w"]}
            return new, {"loss": loss(state)}

        run = data_parallel_step(step, mesh, donate_state=False)
        batch = shard_batch(mesh, {"x": jnp.arange(16, dtype=jnp.float32).reshape(16, 1)})
        state, metrics = run(params, batch)
        assert state["w"].shape == (4,)
        assert float(metrics["loss"]) > 0
        # replicated output matches single-device execution
        s2, _ = step(params, {"x": jnp.arange(16, dtype=jnp.float32).reshape(16, 1)})
        np.testing.assert_allclose(np.asarray(state["w"]), np.asarray(s2["w"]), rtol=1e-6)
