"""Pallas FLASH kernel equivalence tests (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from targetdiarization_tpu.ops.pallas.flash import (
    flash_group_attention,
    flash_group_attention_reference,
)


@pytest.mark.parametrize("shape", [(1, 2, 32, 16, 64), (2, 3, 64, 32, 128)])
def test_kernel_matches_reference(shape, rng):
    b, G, g, d, e = shape
    q = jnp.asarray(rng.standard_normal((b, G, g, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, G, g, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, G, g, e)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((b, G, g, e)), jnp.float32)
    mask = jnp.ones((b, G, 1, g))
    rv, ru = flash_group_attention_reference(q, k, v, u, mask)
    pv, pu = flash_group_attention(q, k, v, u, mask, use_pallas=True)
    np.testing.assert_allclose(np.asarray(rv), np.asarray(pv), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ru), np.asarray(pu), atol=1e-4)


def test_mask_zeroes_columns(rng):
    b, G, g, d, e = 1, 1, 32, 16, 32
    q = jnp.asarray(rng.standard_normal((b, G, g, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, G, g, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, G, g, e)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((b, G, g, e)), jnp.float32)
    mask = jnp.concatenate([jnp.ones((b, G, 1, 16)), jnp.zeros((b, G, 1, 16))],
                           axis=-1)
    pv, pu = flash_group_attention(q, k, v, u, mask, use_pallas=True)
    # with the second half of keys masked, changing that half of V must
    # not change the output
    v2 = v.at[..., 16:, :].set(99.0)
    pv2, _ = flash_group_attention(q, k, v2, u, mask, use_pallas=True)
    np.testing.assert_allclose(np.asarray(pv), np.asarray(pv2), atol=1e-5)


def test_auto_select_on_cpu_uses_reference(rng):
    b, G, g, d, e = 1, 1, 16, 8, 16
    args = [jnp.asarray(rng.standard_normal((b, G, g, x)), jnp.float32)
            for x in (d, d, e, e)]
    mask = jnp.ones((b, G, 1, g))
    av, au = flash_group_attention(*args, mask)  # auto: jnp on CPU
    rv, ru = flash_group_attention_reference(*args, mask)
    np.testing.assert_allclose(np.asarray(av), np.asarray(rv), atol=1e-6)
