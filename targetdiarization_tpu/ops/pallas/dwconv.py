"""Pallas TPU kernel: depthwise (grouped→1) 1-D convolution.

The jnp shifted-add formulation of a depthwise conv issues K separate
slice-FMA kernels, each re-reading the whole activation from HBM — for
MossFormer2's dilated FSMN memory (K=39, T=16k, C=256..2048) that is
~40× the speed-of-light HBM traffic and dominated the separator's
runtime (measured ~215 ms of a 345 ms forward). This kernel tiles the
time axis, keeps each tile plus its halo in VMEM, and performs all K
taps as in-register FMAs: activations are read from HBM exactly once.

Layout contract matches `nn.Conv(features=C, kernel_size=(K,),
feature_group_count=C)`: x is (B, T, C·m) with group g reading input
channels [g·m, (g+1)·m); weight is (K, m, C).

Status: default path for wide channels (cin ≥ 2048) on TPU, where XLA's
slice-FMA fusion breaks down — measured 1.97 vs 5.42 ms (K=17) and
3.24 vs 9.24 ms (K=39) at (1, 16128, 2048) bf16. For C ≤ 1024 the jnp
formulation already reaches ~HBM-bound and the two tie, so ops/dwconv.py
keeps jnp there (TD_PALLAS_DWCONV=1/0 force-overrides the routing).
Differentiable via custom VJP (dx = depthwise conv with the flipped
kernel; dw = K shifted reductions in plain jnp).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _tile_t(cin: int, itemsize: int = 2) -> int:
    """Time rows per program, bounding VMEM: the kernel holds two input
    blocks, their (2·tile, cin) concat window, an f32 (tile, cin)
    accumulator and the output block — ≈ tile·cin·(5·itemsize + 8) bytes.
    Budget ~8 MB of the 16 MB VMEM."""
    per_row = cin * (5 * itemsize + 8)
    tile = (8 * 1024 * 1024) // max(per_row, 1)
    return max(min(tile // 128 * 128, 512), 128)


def _dw_kernel(x_cur, x_next, w_ref, out_ref, *, k: int, m: int,
               dilation: int, tile_t: int):
    """out[t, c] = Σ_i Σ_j w[i, j, c] · win[t + i·d, c·m + j]."""
    win = jnp.concatenate([x_cur[0], x_next[0]], axis=0)  # (2·tile, C·m)
    c = out_ref.shape[-1]
    acc = jnp.zeros((tile_t, c), jnp.float32)
    for i in range(k):
        rows = win[i * dilation : i * dilation + tile_t, :]
        if m == 1:
            acc += rows.astype(jnp.float32) * w_ref[i, 0, :].astype(jnp.float32)
        else:
            rows3 = rows.reshape(tile_t, c, m)
            for j in range(m):
                acc += rows3[:, :, j].astype(jnp.float32) * w_ref[i, j, :].astype(
                    jnp.float32
                )
    out_ref[0] = acc.astype(out_ref.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def dw_conv1d_pallas(x: jnp.ndarray, w: jnp.ndarray, dilation: int = 1,
                     pad_l: int | None = None, pad_r: int | None = None
                     ) -> jnp.ndarray:
    """Depthwise conv of x (B, T, C·m) with w (K, m, C) → (B, T, C).

    pad_l/pad_r default to SAME padding for the dilated span.
    """
    return _dw_fwd_impl(x, w, dilation, pad_l, pad_r)


def _dw_fwd_impl(x, w, dilation, pad_l, pad_r):
    k, m, c = w.shape
    b, t, cin = x.shape
    if m > 1:
        # Mosaic can't shape-cast (T, C·m) → (T, C, m) in-kernel; run m
        # single-tap-group convs on strided channel views and sum.
        out = None
        for j in range(m):
            oj = _dw_fwd_impl(x[..., j::m], w[:, j : j + 1, :], dilation,
                              pad_l, pad_r)
            out = oj if out is None else out + oj
        return out
    span = (k - 1) * dilation
    if pad_l is None:
        pad_l = span // 2
    if pad_r is None:
        pad_r = span - span // 2
    t_out = t + pad_l + pad_r - span
    tile = _tile_t(cin, x.dtype.itemsize)
    n_tiles = -(-t_out // tile)
    # pad so every tile and its "next" halo block exist
    total = (n_tiles + 1) * tile
    xp = jnp.pad(x, ((0, 0), (pad_l, total - t - pad_l), (0, 0)))

    out = pl.pallas_call(
        partial(_dw_kernel, k=k, m=m, dilation=dilation, tile_t=tile),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * tile, c), x.dtype),
        grid=(b, n_tiles),
        interpret=jax.default_backend() in ("cpu", "gpu"),
        in_specs=[
            pl.BlockSpec((1, tile, cin), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, cin), lambda bi, i: (bi, i + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, m, c), lambda bi, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
    )(xp, xp, w)
    return out[:, :t_out]


def _dw_fwd(x, w, dilation, pad_l, pad_r):
    return _dw_fwd_impl(x, w, dilation, pad_l, pad_r), (x, w)


def _dw_bwd(dilation, pad_l, pad_r, res, g):
    x, w = res
    k, m, c = w.shape
    b, t, cin = x.shape
    span = (k - 1) * dilation
    if pad_l is None:
        pad_l = span // 2
    if pad_r is None:
        pad_r = span - span // 2
    t_out = t + pad_l + pad_r - span

    # dx: correlate g with the flipped kernel. Output position t of the
    # forward reads x[t − pad_l + i·d]; so x[s] receives
    # Σ_i w[i]·g[s + pad_l − i·d] — a depthwise conv of g with the
    # kernel flipped along taps, padding swapped.
    if m == 1:
        w_flip = w[::-1]
        dx = dw_conv1d_pallas(g, w_flip, dilation, span - pad_l, span - pad_r)
    else:
        # m>1: each input channel c·m+j feeds output channel c with
        # weight w[i, j, c]; scatter g back per tap in jnp (training-only
        # path, grouped-input convs are rare and small)
        gp = jnp.pad(g, ((0, 0), (span - pad_l, span - pad_r), (0, 0)))
        parts = []
        for j in range(m):
            acc = jnp.zeros((b, t, c), x.dtype)
            for i in range(k):
                off = span - i * dilation
                acc = acc + gp[:, off : off + t, :] * w[i, j, :]
            parts.append(acc)
        dx = jnp.stack(parts, axis=-1).reshape(b, t, c * m)

    # dw[i, j, c] = Σ_{b,t} g[b, t, c] · xp[b, t + i·d, c·m + j]
    xp = jnp.pad(x, ((0, 0), (pad_l, pad_r), (0, 0)))
    dws = []
    for i in range(k):
        rows = jax.lax.dynamic_slice_in_dim(xp, i * dilation, t_out, axis=1)
        rows = rows.reshape(b, t_out, c, m)
        dws.append(jnp.einsum("btc,btcj->jc", g.astype(jnp.float32),
                              rows.astype(jnp.float32)))
    dw = jnp.stack(dws, axis=0).astype(w.dtype)  # (k, m, c)
    return dx, dw


dw_conv1d_pallas.defvjp(_dw_fwd, _dw_bwd)


def supported(x_shape, w_shape, dilation: int = 1) -> bool:
    """Pallas path constraints: lane-aligned channels, span ≤ tile."""
    k, m, c = w_shape
    cin = x_shape[-1]
    return (
        c % 128 == 0
        and cin % 128 == 0
        and (k - 1) * dilation <= 128  # min tile
    )
