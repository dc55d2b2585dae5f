"""Fused FFConvM megakernel (Pallas TPU): norm → Dense → SiLU → depthwise
conv(+residual) in ONE pass over HBM.

FFConvM (models/separation.py, reference mossformer_block.py:89-141) is
MossFormer2's ubiquitous feed-forward: it appears 5× per
flash+FSMN pair (to_hidden 512→2048, to_qk 512→128, to_out 1024→512,
to_u/to_v 256→256). Unfused, the chain costs three full-width HBM
round-trips (dense out, conv in, conv out + residual reads), and the
depthwise conv alone runs at ~12% of HBM speed-of-light because XLA
materializes every tap shift (measured 1.36 ms for k=17 @ (1,16128,2048)
bf16 on v5e where the pure IO bound is 0.16 ms).

This kernel tiles the time axis, computes the rowwise norm and the
Dense matmul on the MXU for a tile plus its conv halo, applies SiLU,
and performs all K taps as in-VMEM FMAs against the resident f32
activations — the normalized input, dense output, and conv input never
touch HBM. Input x is read once, output written once.

Grid: (batch, time-tiles, cout-chunks). The halo is realized with the
two-block trick (the x operand is passed twice with block indices i and
i+1, concatenated in VMEM), so halo rows are recomputed by the matmul
(≤ span/tile ≈ 6% extra MXU work — the matmul is ~3% of the op's time).

Semantics parity: identical math to the unfused module chain, including
SAME zero-padding of the conv at the ARRAY edges (rows outside [0, T)
contribute zero, while in-array silent rows contribute silu(bias), just
as the unfused chain computes). `ffconvm_reference` is the jnp oracle
used for the custom VJP and for CPU tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _norm_f32(x, na, nb, norm: str, eps: float = 1e-5):
    """Rowwise norm in f32: ScaleNorm (na=g) or LayerNorm (na=scale,
    nb=bias), matching models/separation.py semantics exactly."""
    xf = x.astype(jnp.float32)
    if norm == "scalenorm":
        scale = x.shape[-1] ** -0.5
        ss = jnp.sum(jnp.square(xf), axis=-1, keepdims=True)
        denom = jnp.sqrt(jnp.maximum(ss * (scale * scale), eps * eps))
        return xf / denom * na.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y * na.astype(jnp.float32) + nb.astype(jnp.float32)


def ffconvm_reference(x, na, nb, wk, wb, dwk, norm: str = "scalenorm"):
    """jnp oracle: norm → dense → silu → (h + dwconv_same(h))."""
    y = _norm_f32(x, na, nb, norm).astype(x.dtype)
    h = jax.nn.silu(jnp.dot(y, wk.astype(y.dtype),
                            preferred_element_type=jnp.float32)
                    + wb.astype(jnp.float32))
    h = h.astype(x.dtype)
    k = dwk.shape[0]
    span = k - 1
    pad_l, pad_r = span // 2, span - span // 2
    hp = jnp.pad(h, ((0, 0), (pad_l, pad_r), (0, 0)))
    t = h.shape[1]
    acc = jnp.zeros(h.shape, jnp.float32)
    for i in range(k):
        acc = acc + hp[:, i: i + t, :].astype(jnp.float32) * \
            dwk[i, 0, :].astype(jnp.float32)
    return h + acc.astype(x.dtype)


def _kernel(x_cur, x_next, na_ref, nb_ref, wk_ref, wb_ref, dwk_ref,
            out_ref, *, norm: str, k: int, tile_t: int, t_valid: int,
            pad_l: int):
    span = k - 1
    rows = tile_t + span
    win = jnp.concatenate([x_cur[0], x_next[0]], axis=0)[:rows]
    # global row index of each window row in the UNPADDED input domain
    ti = pl.program_id(1)
    gidx = ti * tile_t + jax.lax.broadcasted_iota(
        jnp.int32, (rows, 1), 0) - pad_l
    valid = (gidx >= 0) & (gidx < t_valid)
    y = _norm_f32(win, na_ref[0], nb_ref[0], norm).astype(win.dtype)
    h = jnp.dot(y, wk_ref[:], preferred_element_type=jnp.float32) \
        + wb_ref[0].astype(jnp.float32)
    h = jax.nn.silu(h)
    h = jnp.where(valid, h, 0.0)  # conv zero-pads at array edges
    acc = h[pad_l: pad_l + tile_t]  # residual (the conv input itself)
    for i in range(k):
        acc = acc + h[i: i + tile_t] * dwk_ref[i, 0, :].astype(jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("norm", "interpret"))
def _ffconvm_pallas(x, na, nb, wk, wb, dwk, norm: str = "scalenorm",
                    interpret: bool = False):
    b, t, cin = x.shape
    cout = wk.shape[1]
    k = dwk.shape[0]
    span = k - 1
    pad_l = span // 2
    # time tile: bound VMEM ≈ x window (2·tile·cin·2B) + f32 h/acc
    # ((tile+span)·cc·8B) + out (tile·cc·2B) + weights (cin·cc·2B)
    cc = min(cout, 1024)
    tile = 512 if (cin + cc) <= 1536 else 256
    n_tiles = -(-t // tile)
    total = (n_tiles + 1) * tile
    xp = jnp.pad(x, ((0, 0), (pad_l, total - t - pad_l), (0, 0)))
    # norm params as (1, cin) rows (scalar ScaleNorm g broadcasts)
    na2 = jnp.broadcast_to(na.astype(x.dtype).reshape(1, -1), (1, cin))
    nb2 = jnp.broadcast_to(nb.astype(x.dtype).reshape(1, -1), (1, cin))
    wb2 = wb.reshape(1, cout)

    out = pl.pallas_call(
        partial(_kernel, norm=norm, k=k, tile_t=tile, t_valid=t,
                pad_l=pad_l),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * tile, cout), x.dtype),
        grid=(b, n_tiles, cout // cc),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, tile, cin), lambda bi, ti, ci: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, cin), lambda bi, ti, ci: (bi, ti + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda bi, ti, ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda bi, ti, ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, cc), lambda bi, ti, ci: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cc), lambda bi, ti, ci: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1, cc), lambda bi, ti, ci: (0, 0, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, cc),
                               lambda bi, ti, ci: (bi, ti, ci),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * cin * cout + 2 * b * t * cout * (k + 2),
            bytes_accessed=x.dtype.itemsize * b * t * (cin + cout),
            transcendentals=2 * b * t * cout,  # silu sigmoid
        ),
    )(xp, xp, na2, nb2, wk, wb2, dwk)
    return out[:, :t]


@partial(jax.custom_vjp, nondiff_argnums=(6,))
def _ffconvm_fused(x, na, nb, wk, wb, dwk, norm):
    """Pallas forward; reference-formulation backward (pallas_call has
    no automatic VJP; the jnp gradient is mathematically exact for the
    same primal — same pattern as ops/pallas/flash.py)."""
    interpret = jax.default_backend() != "tpu"
    return _ffconvm_pallas(x, na, nb, wk, wb, dwk, norm=norm,
                           interpret=interpret)


def _ff_fwd(x, na, nb, wk, wb, dwk, norm):
    return _ffconvm_fused(x, na, nb, wk, wb, dwk, norm), \
        (x, na, nb, wk, wb, dwk)


def _ff_bwd(norm, res, g):
    x, na, nb, wk, wb, dwk = res
    _, vjp = jax.vjp(
        lambda *a: ffconvm_reference(*a, norm=norm),
        x, na, nb, wk, wb, dwk)
    return vjp(g)


_ffconvm_fused.defvjp(_ff_fwd, _ff_bwd)


def supported(cin: int, cout: int) -> bool:
    """Lane-alignment constraints for the Pallas path."""
    return cin % 128 == 0 and cout % 128 == 0 and \
        (cout % min(cout, 1024)) == 0


def ffconvm_fused(x, na, nb, wk, wb, dwk, norm: str = "scalenorm",
                  use_pallas: bool | None = None):
    """Fused FFConvM: norm → Dense → SiLU → dwconv(+residual), one HBM
    pass. na/nb: ScaleNorm g / unused, or LayerNorm scale/bias.
    use_pallas: None = auto (Pallas on TPU, jnp elsewhere); True on
    non-TPU runs the kernel in interpreter mode (tests). Differentiable
    either way (custom VJP via the reference formulation)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return _ffconvm_fused(x, na, nb, wk, wb, dwk, norm)
    return ffconvm_reference(x, na, nb, wk, wb, dwk, norm=norm)
