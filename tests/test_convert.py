"""Weight-converter harness tests (torch-cpu is available in-image)."""

import numpy as np
import pytest

from targetdiarization_tpu.runtime.convert import (
    ConversionRules,
    convert_conv1d,
    convert_conv2d,
    convert_linear,
    convert_norm,
    verify_tree_shapes,
)

torch = pytest.importorskip("torch")


class TestLayerConverters:
    def test_linear_semantics(self):
        """torch Linear(x) == flax Dense with converted params."""
        lin = torch.nn.Linear(4, 3)
        x = torch.randn(2, 4)
        want = lin(x).detach().numpy()
        p = convert_linear(lin.weight, lin.bias)
        got = x.numpy() @ p["kernel"] + p["bias"]
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_conv1d_semantics(self):
        import jax.numpy as jnp
        from flax import linen as nn

        conv_t = torch.nn.Conv1d(3, 5, kernel_size=3, padding=1)
        x = torch.randn(1, 3, 16)
        want = conv_t(x).detach().numpy()  # (1, 5, 16)
        p = convert_conv1d(conv_t.weight, conv_t.bias)
        conv_f = nn.Conv(5, (3,), padding="SAME")
        got = conv_f.apply(
            {"params": {"kernel": jnp.asarray(p["kernel"]),
                        "bias": jnp.asarray(p["bias"])}},
            jnp.asarray(x.numpy().transpose(0, 2, 1)))  # NLC
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 2, 1), want, atol=1e-4)

    def test_conv2d_shape(self):
        conv = torch.nn.Conv2d(3, 8, kernel_size=(5, 3))
        p = convert_conv2d(conv.weight, conv.bias)
        assert p["kernel"].shape == (5, 3, 3, 8)

    def test_norm(self):
        ln = torch.nn.LayerNorm(6)
        p = convert_norm(ln.weight, ln.bias)
        assert p["scale"].shape == (6,) and p["bias"].shape == (6,)


class TestRules:
    def test_state_dict_mapping(self):
        sd = {
            "encoder.0.weight": torch.randn(8, 4),
            "encoder.0.bias": torch.randn(8),
            "head.weight": torch.randn(2, 8),
            "head.bias": torch.randn(2),
        }
        rules = ConversionRules([
            (r"encoder\.(\d+)", "enc_{0}", "linear"),
            (r"head", "head", "linear"),
        ])
        tree = rules.convert(sd)
        assert tree["enc_0"]["kernel"].shape == (4, 8)
        assert tree["head"]["kernel"].shape == (8, 2)

    def test_unmatched_raises(self):
        rules = ConversionRules([(r"known", "k", "linear")])
        with pytest.raises(KeyError):
            rules.convert({"unknown.weight": torch.randn(2, 2)})

    def test_verify_shapes_against_model_init(self):
        import jax
        import jax.numpy as jnp

        from targetdiarization_tpu.models.vad import FsmnVADNet

        net = FsmnVADNet(n_layers=1)
        template = net.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 10, 80)), jnp.array([10]))["params"]
        # converted tree with a deliberate shape error
        bad = jax.tree_util.tree_map(
            lambda x: np.zeros(x.shape, np.float32), template)
        bad["in_proj"]["kernel"] = np.zeros((7, 7), np.float32)
        with pytest.raises(ValueError):
            verify_tree_shapes(bad, template)
        good = jax.tree_util.tree_map(
            lambda x: np.zeros(x.shape, np.float32), template)
        checked = verify_tree_shapes(good, template)
        assert len(checked) > 3
