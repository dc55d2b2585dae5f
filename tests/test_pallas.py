"""Pallas FLASH kernel equivalence tests (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from targetdiarization_tpu.ops.pallas.flash import (
    flash_gated_attention,
    flash_gated_attention_reference,
    flash_group_attention,
    flash_group_attention_reference,
)


def _gated_inputs(rng, b=1, G=2, g=32, d=16, e=32, masked_cols=0):
    q = jnp.asarray(rng.standard_normal((b, G, g, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, G, g, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, G, g, e)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((b, G, g, e)), jnp.float32)
    lq = jnp.asarray(rng.standard_normal((b, G, g, d)), jnp.float32)
    kv = jnp.asarray(rng.standard_normal((b, d, e)) * 0.1, jnp.float32)
    ku = jnp.asarray(rng.standard_normal((b, d, e)) * 0.1, jnp.float32)
    if masked_cols:
        mask = jnp.concatenate(
            [jnp.ones((b, G, 1, g - masked_cols)),
             jnp.zeros((b, G, 1, masked_cols))], axis=-1)
    else:
        mask = jnp.ones((b, G, 1, g))
    return q, k, v, u, mask, lq, kv, ku


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


@pytest.mark.parametrize("shape", [(1, 2, 32, 16, 64), (2, 3, 64, 32, 128)])
def test_gated_kernel_matches_reference(shape, rng):
    b, G, g, d, e = shape
    args = _gated_inputs(rng, b, G, g, d, e)
    ref = flash_gated_attention_reference(*args)
    got = flash_gated_attention(*args, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_gated_kernel_masked_columns(rng):
    """Masked key columns must not influence the quadratic term."""
    args = list(_gated_inputs(rng, g=32, masked_cols=16))
    got = flash_gated_attention(*args, use_pallas=True)
    args2 = list(args)
    args2[2] = args[2].at[..., 16:, :].set(99.0)  # masked half of V
    # V also feeds the gate pointwise, so only compare unmasked rows
    got2 = flash_gated_attention(*args2, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got[..., :16, :]),
                               np.asarray(got2[..., :16, :]), atol=1e-5)


def test_gated_grad_matches_reference(rng):
    """The Pallas gated forward's custom VJP must equal the jnp gradient."""
    import jax

    q, k, v, u, mask, lq, kv, ku = _gated_inputs(rng)

    def loss_p(q, k, v, u, lq, kv, ku):
        out = flash_gated_attention(q, k, v, u, mask, lq, kv, ku,
                                    use_pallas=True)
        return jnp.sum(out * 0.1) + jnp.sum(jnp.square(out) * 0.01)

    def loss_r(q, k, v, u, lq, kv, ku):
        out = flash_gated_attention_reference(q, k, v, u, mask, lq, kv, ku)
        return jnp.sum(out * 0.1) + jnp.sum(jnp.square(out) * 0.01)

    gp = jax.grad(loss_p, argnums=tuple(range(7)))(q, k, v, u, lq, kv, ku)
    gr = jax.grad(loss_r, argnums=tuple(range(7)))(q, k, v, u, lq, kv, ku)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-3, rtol=1e-3)


def test_gated_auto_select_on_cpu_uses_reference(rng):
    args = _gated_inputs(rng, g=16, d=8, e=16)
    got = flash_gated_attention(*args)  # auto: jnp on CPU
    ref = flash_gated_attention_reference(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_auto_select_on_cpu_uses_reference(rng):
    b, G, g, d, e = 1, 1, 16, 8, 16
    args = [jnp.asarray(rng.standard_normal((b, G, g, x)), jnp.float32)
            for x in (d, d, e, e)]
    mask = jnp.ones((b, G, 1, g))
    av, au = flash_group_attention(*args, mask)  # auto: jnp on CPU
    rv, ru = flash_group_attention_reference(*args, mask)
    np.testing.assert_allclose(np.asarray(av), np.asarray(rv), atol=1e-6)


# ---------------------------------------------------------------------------
# Depthwise conv: jnp shifted-add formulation and the Pallas tiled kernel
# must both match lax.conv_general_dilated with feature_group_count=C
# (the formulation shipped checkpoints were trained against).


def _lax_dwconv(x, w, dilation, pad):
    import jax.lax as lax

    # x (B, T, Cin), w (K, m, C) — flax nn.Conv NWC/WIO grouped layout
    return lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[pad],
        rhs_dilation=(dilation,), feature_group_count=w.shape[2],
        dimension_numbers=("NWC", "WIO", "NWC"))


@pytest.mark.parametrize("shape,k,m,dil", [
    ((2, 100, 64), 3, 1, 1),
    ((1, 257, 32), 39, 1, 1),
    ((1, 200, 64), 3, 1, 8),
    ((1, 64, 96), 5, 3, 2),
])
def test_dwconv_jnp_matches_lax(shape, k, m, dil, rng):
    from targetdiarization_tpu.ops.dwconv import dw_conv1d

    c = shape[-1] // m
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, m, c)) * 0.3, jnp.float32)
    span = (k - 1) * dil
    pad = (span // 2, span - span // 2)
    got = dw_conv1d(x, w, dilation=dil, padding=pad)
    want = _lax_dwconv(x, w, dil, pad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("shape,k,m,dil", [
    ((1, 300, 128), 7, 1, 1),
    ((1, 513, 128), 3, 1, 4),
    ((2, 128, 256), 9, 2, 1),
])
def test_dwconv_pallas_matches_lax(shape, k, m, dil, rng):
    from targetdiarization_tpu.ops.pallas.dwconv import (
        dw_conv1d_pallas, supported)

    c = shape[-1] // m
    assert supported(shape, (k, m, c), dil)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, m, c)) * 0.3, jnp.float32)
    span = (k - 1) * dil
    pad_l, pad_r = span // 2, span - span // 2
    got = dw_conv1d_pallas(x, w, dil, pad_l, pad_r)
    want = _lax_dwconv(x, w, dil, (pad_l, pad_r))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_dwconv_pallas_grad_matches_jnp(rng):
    import jax

    from targetdiarization_tpu.ops.dwconv import dw_conv1d
    from targetdiarization_tpu.ops.pallas.dwconv import dw_conv1d_pallas

    x = jnp.asarray(rng.standard_normal((1, 96, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((5, 1, 128)) * 0.3, jnp.float32)

    def lp(x, w):
        return jnp.sum(dw_conv1d_pallas(x, w, 1, 2, 2) ** 2)

    def lj(x, w):
        return jnp.sum(dw_conv1d(x, w, padding=(2, 2)) ** 2)

    gp = jax.grad(lp, argnums=(0, 1))(x, w)
    gj = jax.grad(lj, argnums=(0, 1))(x, w)
    for a, b in zip(gp, gj):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)


def test_flash_kernel_grad_matches_reference(rng):
    """The Pallas forward's custom VJP must equal the jnp gradient."""
    import jax

    b, G, g, d, e = 1, 2, 32, 16, 32
    q = jnp.asarray(rng.standard_normal((b, G, g, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, G, g, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, G, g, e)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((b, G, g, e)), jnp.float32)
    mask = jnp.ones((b, G, 1, g))

    def loss_p(q, k, v, u):
        ov, ou = flash_group_attention(q, k, v, u, mask, use_pallas=True)
        return jnp.sum(ov * 0.1) + jnp.sum(jnp.square(ou) * 0.01)

    def loss_r(q, k, v, u):
        ov, ou = flash_group_attention_reference(q, k, v, u, mask)
        return jnp.sum(ov * 0.1) + jnp.sum(jnp.square(ou) * 0.01)

    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(q, k, v, u)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(q, k, v, u)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-3, rtol=1e-3)


# ---------------------------------------------------------------------------
# Fused FFConvM megakernel (norm → Dense → SiLU → dwconv+residual).


def _ff_inputs(rng, b=1, t=300, cin=128, cout=256, k=17):
    x = jnp.asarray(rng.standard_normal((b, t, cin)) * 0.3, jnp.float32)
    g = jnp.asarray([1.3], jnp.float32)
    scale = jnp.asarray(1.0 + 0.1 * rng.standard_normal(cin), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal(cin), jnp.float32)
    wk = jnp.asarray(rng.standard_normal((cin, cout)) * 0.05, jnp.float32)
    wb = jnp.asarray(0.1 * rng.standard_normal(cout), jnp.float32)
    dwk = jnp.asarray(rng.standard_normal((k, 1, cout)) * 0.2, jnp.float32)
    return x, g, scale, bias, wk, wb, dwk


@pytest.mark.parametrize("norm", ["scalenorm", "layernorm"])
def test_ffconvm_kernel_matches_reference(norm, rng):
    from targetdiarization_tpu.ops.pallas.ffconvm import (
        ffconvm_fused, ffconvm_reference)

    x, g, scale, bias, wk, wb, dwk = _ff_inputs(rng)
    na, nb = (g, jnp.zeros((1,))) if norm == "scalenorm" else (scale, bias)
    ref = ffconvm_reference(x, na, nb, wk, wb, dwk, norm=norm)
    got = ffconvm_fused(x, na, nb, wk, wb, dwk, norm=norm, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_ffconvm_kernel_multi_tile_and_chunks(rng):
    """Time long enough for several tiles; cout > chunk size exercises
    the cout grid axis; odd T exercises the tail mask."""
    from targetdiarization_tpu.ops.pallas.ffconvm import (
        ffconvm_fused, ffconvm_reference)

    x, g, _, _, wk, wb, dwk = _ff_inputs(rng, t=1111, cin=128, cout=2048)
    na, nb = g, jnp.zeros((1,))
    ref = ffconvm_reference(x, na, nb, wk, wb, dwk)
    got = ffconvm_fused(x, na, nb, wk, wb, dwk, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_ffconvm_edge_padding_is_zero(rng):
    """Rows outside [0, T) contribute zero to the conv (array-edge SAME
    padding) even though in-array silent rows contribute silu(bias)."""
    from targetdiarization_tpu.ops.pallas.ffconvm import (
        ffconvm_fused, ffconvm_reference)

    x, g, _, _, wk, wb, dwk = _ff_inputs(rng, t=300)
    na, nb = g, jnp.zeros((1,))
    ref = ffconvm_reference(x, na, nb, wk, wb, dwk)
    got = ffconvm_fused(x, na, nb, wk, wb, dwk, use_pallas=True)
    # the first/last span rows are where edge handling shows
    np.testing.assert_allclose(np.asarray(got[:, :20]),
                               np.asarray(ref[:, :20]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got[:, -20:]),
                               np.asarray(ref[:, -20:]), atol=2e-4)


def test_ffconvm_grad_matches_reference(rng):
    import jax

    from targetdiarization_tpu.ops.pallas.ffconvm import (
        ffconvm_fused, ffconvm_reference)

    x, g, _, _, wk, wb, dwk = _ff_inputs(rng, t=96, cin=128, cout=128)
    na, nb = g, jnp.zeros((1,))

    def loss_p(x, na, wk, wb, dwk):
        return jnp.sum(jnp.square(ffconvm_fused(
            x, na, nb, wk, wb, dwk, use_pallas=True)))

    def loss_r(x, na, wk, wb, dwk):
        return jnp.sum(jnp.square(ffconvm_reference(x, na, nb, wk, wb, dwk)))

    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3, 4))(x, na, wk, wb, dwk)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(x, na, wk, wb, dwk)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-2, rtol=1e-3)


def test_ffconvm_module_fused_matches_unfused(rng, monkeypatch):
    """FFConvM with the fused kernel forced on (interpret mode) must
    match the unfused module chain on the same params."""
    import jax

    from targetdiarization_tpu.models.separation import FFConvM
    from targetdiarization_tpu.ops.pallas import ffconvm as ffmod

    x = jnp.asarray(rng.standard_normal((1, 200, 128)) * 0.3, jnp.float32)
    for norm in ("scalenorm", "layernorm"):
        mod = FFConvM(256, norm=norm)
        params = mod.init(jax.random.PRNGKey(0), x)
        want = mod.apply(params, x)  # CPU → unfused chain
        # force the fused path by faking a TPU backend check
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(
            ffmod.jax, "default_backend", lambda: "cpu", raising=False)
        got = mod.apply(params, x)
        monkeypatch.undo()
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=2e-4)
