"""Depthwise 1-D convolution as shifted adds (TPU-fast).

XLA on TPU lowers `lax.conv` with `feature_group_count == channels`
(depthwise) to a per-channel loop that runs ~50× slower than the
arithmetic warrants — measured ~100 ms per 39-tap dilated depthwise conv
on (1, 16k, 256) where the FLOPs justify ~2 ms. A depthwise conv is just
K shifted elementwise FMAs, which the VPU executes at full bandwidth:

    y[t, c] = Σ_k w[k, c] · x[t + (k·d − pad_l), c]

`DepthwiseConv1d` keeps the exact parameter pytree of
`nn.Conv(features, (k,), feature_group_count=features, use_bias=False)`
— one "kernel" param of shape (k, in_per_group, features) — so model
checkpoints trained against the nn.Conv formulation load unchanged.
"""

from __future__ import annotations

from typing import Any, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp


def _use_pallas(cin: int) -> bool:
    """Width-dependent routing, measured on v5e (RTT-amortized, bf16,
    T=16k): XLA fuses the K slice-FMAs to ~HBM-bound up to C=1024
    (pallas ties there — 0.57 vs 0.58 ms at C=512 K=17), but the fusion
    falls over at C=2048 where the Pallas tiled kernel wins 2.8×
    (K=17: 1.97 vs 5.42 ms; K=39: 3.24 vs 9.24 ms). Default: Pallas on
    TPU for cin ≥ 2048. Override with TD_PALLAS_DWCONV=1 (always) or
    =0 (never).
    """
    import os

    flag = os.environ.get("TD_PALLAS_DWCONV")
    if flag == "0":
        return False
    if flag != "1" and cin < 2048:
        return False
    import jax

    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


def dw_conv1d(x: jnp.ndarray, kernel: jnp.ndarray, dilation: int = 1,
              padding: Union[str, Sequence[int]] = "SAME") -> jnp.ndarray:
    """Depthwise/grouped-to-1 conv.

    x: (..., T, Cin) with Cin = m·features; kernel: (K, m, features),
    flax nn.Conv layout for feature_group_count=features. Group g reads
    input channels [g·m, (g+1)·m) — identical to lax grouped-conv
    channel assignment.

    Two paths (see _use_pallas for the measurements): K static
    slice-FMAs that XLA fuses to ~HBM-bound for C ≤ 1024, and the Pallas
    tiled kernel for wide channels (C ≥ 2048) where that fusion breaks
    down.
    """
    k, m, features = kernel.shape
    t = x.shape[-2]
    span = (k - 1) * dilation
    if isinstance(padding, str):
        if padding.upper() != "SAME":
            raise ValueError(f"unsupported padding {padding!r}")
        pad_l = span // 2
        pad_r = span - pad_l
    else:
        pad_l, pad_r = padding

    if _use_pallas(x.shape[-1]):
        from .pallas import dwconv as pdw

        if pdw.supported(x.shape, kernel.shape, dilation):
            kern = kernel.astype(x.dtype)
            if x.ndim == 3:
                return pdw.dw_conv1d_pallas(x, kern, dilation, pad_l, pad_r)
            if x.ndim == 2:
                return pdw.dw_conv1d_pallas(x[None], kern, dilation, pad_l,
                                            pad_r)[0]

    if m > 1:
        # grouped-input conv = m strided-channel depthwise convs summed
        # (input channel c·m+j feeds group c) — each term is the fusable
        # m=1 slice-FMA chain below; the per-tap (…, C, m) einsum this
        # replaces lowered to 39 unfused tiny-contraction dots (~6 ms of
        # GatedFsmnBlock's cost at C=256)
        out = None
        for j in range(m):
            oj = dw_conv1d(x[..., j::m], kernel[:, j : j + 1, :],
                           dilation=dilation, padding=(pad_l, pad_r))
            out = oj if out is None else out + oj
        return out

    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(pad_l, pad_r), (0, 0)])
    t_avail = t + pad_l + pad_r - span
    out = None
    kern = kernel.astype(x.dtype)
    for i in range(k):
        xi = xp[..., i * dilation : i * dilation + t_avail, :]
        term = xi * kern[i, 0]
        out = term if out is None else out + term
    return out


class DepthwiseConv1d(nn.Module):
    """Drop-in for nn.Conv(features, (kernel_size,),
    feature_group_count=features) with identical params."""

    features: int
    kernel_size: int
    dilation: int = 1
    padding: Any = "SAME"
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        m = x.shape[-1] // self.features
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, m, self.features),
        )
        y = dw_conv1d(x, kernel, dilation=self.dilation, padding=self.padding)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y
