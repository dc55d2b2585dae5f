"""Alternative separation architectures (model-zoo breadth).

The reference's look2hear registry exposes 13 loadable separators beyond
the production MossFormer2 (look2hear/models/__init__.py:1-31). This
module provides TPU-native counterparts of the widely used ones, all
registered with the framework registry and sharing one contract:

    model.apply(params, wav (B, T), lengths=None, deterministic=True)
        -> (B, num_spks, T)

so `SeparationEngine` and `SeparationTrainer` work with any of them
(checkpoint-embedded dispatch picks the class at load time, mirroring
base_model.py:52-64).

Designs are faithful to each paper's core mechanism but expressed in
XLA-friendly form (static segmentation, masked norms, scan-based RNNs):

  ConvTasNet   TCN masking separator (look2hear ConvTasnet.py:176)
  DPRNNTasNet  dual-path RNN (look2hear dprnn.py:319)
  DPTNet       dual-path transformer (look2hear dptnet.py)
  SuDORMRF     successive downsampling/resampling U-conv blocks
               (look2hear sudormrf.py:330)
  SkiMNet      skipping-memory segment LSTM (look2hear skim.py:796)
  BSRNN        band-split RNN over STFT bands (look2hear bsrnn.py:50)
  TDANet       top-down attention pyramid (look2hear tdanet.py)
  TFGridNet    time-frequency grid dual-RNN (look2hear TFGNet.py:352)
  MossFormer   v1, FLASH-only stack (look2hear mossformer.py:476)
  AFRCNN       asynchronous fully recurrent conv net (look2hear afrcnn.py)
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stft import stft, istft
from ..ops.dwconv import DepthwiseConv1d
from ..runtime.registry import register_model


def _length_mask(lengths, t, dtype=jnp.float32):
    return (jnp.arange(t)[None, :] < lengths[:, None]).astype(dtype)


class _MaskedGLN(nn.Module):
    """Global layer norm over (T, C) with mask. With a full mask this is
    numerically the reference's GlobalChannelLayerNorm
    (ConvTasnet.py:33-66) — masking is this framework's static-shape
    addition."""

    dim: int
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x, mask):
        w = self.param("w", nn.initializers.ones, (self.dim,))
        b = self.param("b", nn.initializers.zeros, (self.dim,))
        m = mask[..., None]
        denom = jnp.maximum(jnp.sum(m, axis=(1, 2), keepdims=True) * x.shape[-1], 1.0)
        mean = jnp.sum(x * m, axis=(1, 2), keepdims=True) / denom
        var = jnp.sum(jnp.square(x - mean) * m, axis=(1, 2), keepdims=True) / denom
        return (w * (x - mean) / jnp.sqrt(var + self.eps) + b) * m


class _PReLU(nn.Module):
    """torch nn.PReLU(num_parameters=1) equivalent (init 0.25)."""

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), (1,))
        return jnp.maximum(x, 0) + a.astype(x.dtype) * jnp.minimum(x, 0)


class _EncDec:
    """Shared conv encoder / transposed-conv decoder helpers."""

    @staticmethod
    def encode(wav, channels, kernel, name="encoder"):
        x = nn.Conv(channels, (kernel,), strides=(kernel // 2,),
                    padding="VALID", use_bias=False, name=name)(wav[..., None])
        return jax.nn.relu(x)

    @staticmethod
    def decode_module(kernel, name="decoder"):
        return nn.ConvTranspose(1, (kernel,), strides=(kernel // 2,),
                                padding="VALID", use_bias=False, name=name)


def _finalize(est, t_in):
    t_out = est.shape[-1]
    if t_out >= t_in:
        return est[..., :t_in]
    return jnp.pad(est, ((0, 0), (0, 0), (0, t_in - t_out)))


def _mask_decode(x_enc, masks, dec, num_spks, t_in):
    """Apply per-speaker masks and decode each stream."""
    outs = []
    for s in range(num_spks):
        y = dec(x_enc * masks[..., s, :])[..., 0]
        outs.append(y)
    return _finalize(jnp.stack(outs, axis=1), t_in)


# ---------------- ConvTasNet ----------------


class _TCNBlock(nn.Module):
    """Reference Conv1D_Block (ConvTasnet.py:89-115), gLN mode:
    conv1x1 → PReLU → gLN → dwconv(bias) → PReLU → gLN → sconv,
    residual around the whole block."""

    dim: int
    hidden: int
    kernel: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x, mask):
        h = nn.Dense(self.hidden, name="in1x1")(x)
        h = _PReLU(name="prelu1")(h)
        h = _MaskedGLN(self.hidden, eps=1e-5, name="gln1")(h, mask)
        h = DepthwiseConv1d(self.hidden, self.kernel, dilation=self.dilation,
                            use_bias=True, name="dwconv")(h)
        h = _PReLU(name="prelu2")(h)
        h = _MaskedGLN(self.hidden, eps=1e-5, name="gln2")(h, mask)
        return x + nn.Dense(self.dim, name="out1x1")(h)


@register_model(name="ConvTasNet")
class ConvTasNet(nn.Module):
    """Classic TCN masking separator (Luo & Mesgarani 2019), faithful to
    the reference graph (ConvTasnet.py:176-228): raw (unactivated) conv
    encoder, gLN+1×1 bottleneck, R×X PReLU TCN blocks, 1×1 mask head
    applied straight to the separation output (no activation before it),
    relu mask nonlinearity on the raw encoder frames, biased transposed-
    conv decoder. Loadable from a reference torch checkpoint via
    runtime/port_rules.py::convert_convtasnet (forward parity verified
    in tests/test_convert.py); length-masking is additive — with a full
    mask the computation is the reference's exactly."""

    enc_channels: int = 512   # N
    bottleneck: int = 128     # B
    hidden: int = 512         # H (must equal N: the reference multiplies
    #                           H-channel masks onto the N-channel encoder)
    kernel_size: int = 16     # L
    n_blocks: int = 8         # X
    n_repeats: int = 3        # R
    num_spks: int = 2
    sample_rate: int = 16000

    @nn.compact
    def __call__(self, wav, lengths=None, deterministic: bool = True):
        b, t_in = wav.shape
        x = nn.Conv(self.enc_channels, (self.kernel_size,),
                    strides=(self.kernel_size // 2,), padding="VALID",
                    use_bias=True, name="encoder")(wav[..., None])
        t = x.shape[1]
        if lengths is None:
            lengths = jnp.full((b,), t_in)
        mask = _length_mask(
            jnp.clip((lengths - self.kernel_size) // (self.kernel_size // 2) + 1,
                     1, t), t)
        x = x * mask[..., None]
        h = _MaskedGLN(self.enc_channels, eps=1e-5, name="in_norm")(x, mask)
        h = nn.Dense(self.bottleneck, name="bottleneck")(h)
        for r in range(self.n_repeats):
            for i in range(self.n_blocks):
                h = _TCNBlock(self.bottleneck, self.hidden, dilation=2 ** i,
                              name=f"tcn_{r}_{i}")(h, mask)
        m = nn.Dense(self.hidden * self.num_spks, name="mask_out")(h)
        m = jax.nn.relu(m).reshape(b, t, self.num_spks, self.hidden)
        m = m * mask[..., None, None]
        dec = nn.ConvTranspose(1, (self.kernel_size,),
                               strides=(self.kernel_size // 2,),
                               padding="VALID", use_bias=True,
                               name="decoder")
        return _mask_decode(x, m, dec, self.num_spks, t_in)


# ---------------- dual-path segmentation helpers ----------------


def _segment(x, k: int):
    """(B, T, D) → (B, S, K, D) half-overlapping chunks (zero padded)."""
    b, t, d = x.shape
    hop = k // 2
    pad = (-(t - k)) % hop if t > k else k - t
    x = jnp.pad(x, ((0, 0), (0, pad + hop), (0, 0)))
    n_seg = (x.shape[1] - k) // hop + 1
    idx = jnp.arange(k)[None, :] + hop * jnp.arange(n_seg)[:, None]
    return x[:, idx], t


def _overlap_add_segments(seg, t: int):
    """(B, S, K, D) → (B, T, D) with 50% overlap-add."""
    b, s, k, d = seg.shape
    hop = k // 2
    out_len = (s - 1) * hop + k
    idx = (jnp.arange(k)[None, :] + hop * jnp.arange(s)[:, None]).reshape(-1)
    out = jnp.zeros((b, out_len, d), seg.dtype)
    out = out.at[:, idx].add(seg.reshape(b, -1, d))
    norm = jnp.zeros(out_len, seg.dtype).at[idx].add(1.0)
    return (out / jnp.maximum(norm, 1.0)[None, :, None])[:, :t]


class _BiRNN(nn.Module):
    hidden: int
    cell: str = "lstm"

    @nn.compact
    def __call__(self, x):
        cell_cls = {"lstm": nn.OptimizedLSTMCell, "gru": nn.GRUCell}[self.cell]
        fwd = nn.RNN(cell_cls(self.hidden), name="fwd")(x)
        bwd = nn.RNN(cell_cls(self.hidden), reverse=True, keep_order=True,
                     name="bwd")(x)
        return jnp.concatenate([fwd, bwd], axis=-1)


class _DualPathBlock(nn.Module):
    """Intra-chunk + inter-chunk processing (RNN or transformer)."""

    dim: int
    hidden: int
    kind: str = "rnn"  # "rnn" | "transformer"

    @nn.compact
    def __call__(self, seg):
        b, s, k, d = seg.shape
        # intra (within chunk)
        intra_in = seg.reshape(b * s, k, d)
        if self.kind == "rnn":
            h = _BiRNN(self.hidden, name="intra_rnn")(intra_in)
            h = nn.Dense(d, name="intra_proj")(h)
        else:
            h = _TransformerLayer(d, name="intra_tr")(intra_in)
        h = nn.LayerNorm(name="intra_ln")(h)
        seg = seg + h.reshape(b, s, k, d)
        # inter (across chunks)
        inter_in = seg.transpose(0, 2, 1, 3).reshape(b * k, s, d)
        if self.kind == "rnn":
            h = _BiRNN(self.hidden, name="inter_rnn")(inter_in)
            h = nn.Dense(d, name="inter_proj")(h)
        else:
            h = _TransformerLayer(d, name="inter_tr")(inter_in)
        h = nn.LayerNorm(name="inter_ln")(h)
        return seg + h.reshape(b, k, s, d).transpose(0, 2, 1, 3)


class _TransformerLayer(nn.Module):
    dim: int
    heads: int = 4

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm()(x)
        h = nn.MultiHeadDotProductAttention(num_heads=self.heads,
                                            qkv_features=self.dim)(h, h)
        x = x + h
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.dim * 4)(h)
        h = jax.nn.relu(h)
        return x + nn.Dense(self.dim)(h)


class _DualPathSeparator(nn.Module):
    """Shared top-level for DPRNN / DPTNet / SkiM-style models."""

    enc_channels: int = 64
    dim: int = 64
    hidden: int = 128
    kernel_size: int = 16
    chunk: int = 100
    n_layers: int = 4
    num_spks: int = 2
    kind: str = "rnn"
    sample_rate: int = 16000

    @nn.compact
    def __call__(self, wav, lengths=None, deterministic: bool = True):
        b, t_in = wav.shape
        x = _EncDec.encode(wav, self.enc_channels, self.kernel_size)
        t = x.shape[1]
        h = nn.Dense(self.dim, name="bottleneck")(nn.LayerNorm(name="in_ln")(x))
        seg, t_real = _segment(h, self.chunk)
        for i in range(self.n_layers):
            seg = _DualPathBlock(self.dim, self.hidden, kind=self.kind,
                                 name=f"dp_{i}")(seg)
        h = _overlap_add_segments(seg, t_real)
        m = nn.Dense(self.enc_channels * self.num_spks, name="mask_out")(
            jax.nn.relu(h))
        m = jax.nn.relu(m).reshape(b, t, self.num_spks, self.enc_channels)
        dec = _EncDec.decode_module(self.kernel_size)
        return _mask_decode(x, m, dec, self.num_spks, t_in)


class _TorchLSTM(nn.Module):
    """One-layer (optionally bidirectional) LSTM with torch's exact cell
    semantics and parameter packing (gate order i,f,g,o; separate
    input/hidden biases) so reference checkpoints map weight-for-weight."""

    hidden: int
    bidirectional: bool = False

    @nn.compact
    def __call__(self, x, mask=None):  # (B, T, N) → (B, T, H or 2H)
        # mask (B, T, 1): padded steps pass the carry through unchanged
        # and emit zeros — for a reversed (backward) leg this is exactly
        # length-aware sequence reversal: leading padded steps leave the
        # state at init, so the first valid frame starts from zero state
        # just as at exact length (docs/PARITY.md DPRNNTasNet fix).
        # mask=None keeps the original semantics bit-for-bit.
        def run(xs, ms, name):
            n = xs.shape[-1]
            wi = self.param(f"{name}_wi", nn.initializers.lecun_normal(),
                            (n, 4 * self.hidden))
            wh = self.param(f"{name}_wh", nn.initializers.lecun_normal(),
                            (self.hidden, 4 * self.hidden))
            bi = self.param(f"{name}_bi", nn.initializers.zeros,
                            (4 * self.hidden,))
            bh = self.param(f"{name}_bh", nn.initializers.zeros,
                            (4 * self.hidden,))
            xg = xs @ wi + bi + bh  # input projection hoisted out of scan

            def step(carry, g_t):
                h, c = carry
                gates = g_t + h @ wh
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
                h = jax.nn.sigmoid(o) * jnp.tanh(c)
                return (h, c), h

            def masked_step(carry, inp):
                g_t, m_t = inp
                h, c = carry
                (h_new, c_new), _ = step((h, c), g_t)
                h = m_t * h_new + (1.0 - m_t) * h
                c = m_t * c_new + (1.0 - m_t) * c
                return (h, c), h * m_t

            b = xs.shape[0]
            init = (jnp.zeros((b, self.hidden), xs.dtype),
                    jnp.zeros((b, self.hidden), xs.dtype))
            if ms is None:
                _, hs = jax.lax.scan(step, init, jnp.swapaxes(xg, 0, 1))
            else:
                _, hs = jax.lax.scan(
                    masked_step, init,
                    (jnp.swapaxes(xg, 0, 1),
                     jnp.swapaxes(ms.astype(xs.dtype), 0, 1)))
            return jnp.swapaxes(hs, 0, 1)

        out = run(x, mask, "fwd")
        if self.bidirectional:
            rmask = None if mask is None else mask[:, ::-1]
            out = jnp.concatenate(
                [out, run(x[:, ::-1], rmask, "bwd")[:, ::-1]], axis=-1)
        return out


def _gn(dim, name):
    """GroupNorm(1, C, eps=float32.eps) — the reference's select_norm
    returns exactly this regardless of the `norm` arg (dprnn.py:7-8)."""
    return nn.GroupNorm(num_groups=1, epsilon=1.1920929e-7, name=name)


class _MaskedGN1(nn.Module):
    """nn.GroupNorm(num_groups=1) with optionally masked (T, C) stats.
    Same param names/shapes ('scale', 'bias') as _gn, so torch port
    rules are unaffected; mask=None (or all-ones) reproduces _gn
    exactly. Padded frames are zeroed on output (docs/PARITY.md
    "padded-bucket deviation")."""

    dim: int
    eps: float = 1.1920929e-7

    @nn.compact
    def __call__(self, x, mask=None):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        if mask is None:
            mean = jnp.mean(x, axis=(1, 2), keepdims=True)
            var = jnp.mean(jnp.square(x - mean), axis=(1, 2), keepdims=True)
            m = None
        else:
            m = mask.astype(x.dtype)[..., None]
            denom = jnp.maximum(
                jnp.sum(m, axis=(1, 2), keepdims=True) * x.shape[-1], 1.0)
            mean = jnp.sum(x * m, axis=(1, 2), keepdims=True) / denom
            var = jnp.sum(jnp.square(x - mean) * m,
                          axis=(1, 2), keepdims=True) / denom
        out = scale * (x - mean) / jnp.sqrt(var + self.eps) + bias
        return out if m is None else out * m


def _segment_ref(x, k: int):
    """Reference _Segmentation (dprnn.py:286-301), channels-last:
    (B, L, N) → (B, S, K, N) via end-pad `gap`, P-pad both sides, and
    two interleaved strided views."""
    b, L, n = x.shape
    p = k // 2
    gap = k - (p + L % k) % k
    x = jnp.pad(x, ((0, 0), (p, p + gap), (0, 0)))
    x1 = x[:, :-p].reshape(b, -1, k, n)
    x2 = x[:, p:].reshape(b, -1, k, n)
    seg = jnp.concatenate([x1, x2], axis=2).reshape(b, -1, k, n)
    return seg, gap


def _over_add_ref(seg, gap: int):
    """Reference _over_add (dprnn.py:303-318): inverse of _segment_ref."""
    b, s, k, n = seg.shape
    p = k // 2
    x = seg.reshape(b, s // 2, 2 * k, n)
    x1 = x[:, :, :k].reshape(b, -1, n)[:, p:]
    x2 = x[:, :, k:].reshape(b, -1, n)[:, :-p]
    out = x1 + x2
    return out[:, :-gap] if gap > 0 else out


def _seg_valid_mask(enc_lengths, t: int, k: int):
    """(B, S, K, 1) validity mask for the reference segmentation scheme.

    The exact-length graph processes `L` valid frames PLUS structural
    zero-padding (p leading, gap+p trailing, dprnn.py:286-301) as
    ordinary frames; for a bucket-padded forward to reproduce it, the
    first gap_v(L)+p bucket-pad frames after L must count as valid
    (they hold the same zeros the exact graph's structural pad holds),
    and only frames beyond that are truly nonexistent. Because
    p + L + gap_v(L) ≡ 0 (mod k), valid chunks form a clean prefix
    along S in the interleaved x1/x2 layout, so a masked LSTM's
    pass-through steps reproduce the exact graph's recurrences."""
    p = k // 2
    gap_b = k - (p + t % k) % k
    total = p + t + gap_b + p          # structurally padded frame count
    gap_v = k - (p + enc_lengths % k) % k
    eff = 2 * p + enc_lengths + gap_v  # valid incl. structural zeros
    b = enc_lengths.shape[0]
    pos = jnp.arange(total)[None, :]
    # x1 = x[:, :-p] keeps frames [0, total-p): valid below eff - p
    m1 = (pos[:, : total - p] < (eff - p)[:, None]).astype(jnp.float32)
    # x2 = x[:, p:] keeps frames [p, total): valid below eff
    m2 = (pos[:, p:] < eff[:, None]).astype(jnp.float32)
    m1 = m1.reshape(b, -1, k, 1)
    m2 = m2.reshape(b, -1, k, 1)
    return jnp.concatenate([m1, m2], axis=2).reshape(b, -1, k, 1)


class _DPRNNBlock(nn.Module):
    """Reference Dual_RNN_Block (dprnn.py:70-166) in (B, S, K, N).

    `seg_mask` (B, S, K, 1) threads bucket-padding validity through the
    LSTMs (pass-through steps) and the GroupNorm(1) stats so a padded
    forward matches the exact-length one; None = reference semantics."""

    dim: int
    hidden: int
    bidirectional: bool = True

    def _norm(self, h, seg_mask, name):
        if seg_mask is None:
            return _gn(self.dim, name)(h)
        b, s, k, n = h.shape
        out = _MaskedGN1(self.dim, name=name)(
            h.reshape(b, s * k, n), seg_mask.reshape(b, s * k))
        return out.reshape(b, s, k, n)

    @nn.compact
    def __call__(self, x, seg_mask=None):
        b, s, k, n = x.shape
        intra_m = None if seg_mask is None else seg_mask.reshape(b * s, k, 1)
        h = _TorchLSTM(self.hidden, self.bidirectional,
                       name="intra_rnn")(x.reshape(b * s, k, n), intra_m)
        h = nn.Dense(self.dim, name="intra_proj")(h).reshape(b, s, k, n)
        x = x + self._norm(h, seg_mask, "intra_norm")
        inter = x.transpose(0, 2, 1, 3).reshape(b * k, s, n)
        inter_m = (None if seg_mask is None else
                   seg_mask.transpose(0, 2, 1, 3).reshape(b * k, s, 1))
        h = _TorchLSTM(self.hidden, self.bidirectional,
                       name="inter_rnn")(inter, inter_m)
        h = nn.Dense(self.dim, name="inter_proj")(h)
        h = h.reshape(b, k, s, n).transpose(0, 2, 1, 3)
        return x + self._norm(h, seg_mask, "inter_norm")


@register_model(name="DPRNNTasNet")
class DPRNNTasNet(nn.Module):
    """Dual-path BiLSTM separator (Luo et al. 2020), faithful to the
    reference graph (dprnn.py:319-398): relu conv encoder, GroupNorm(1)
    + 1×1 bottleneck, K-chunk segmentation with the reference's exact
    interleaved-view scheme, N dual-RNN blocks (torch-packed LSTMs),
    PReLU → spk-expand 1×1 → overlap-add → tanh×sigmoid gate → 1×1 →
    relu masks on the encoder, transposed-conv decode. Loadable from a
    reference torch checkpoint via port_rules.convert_dprnn (forward
    parity verified in tests/test_convert.py). With `lengths`, a
    segment-space validity mask (_seg_valid_mask) threads through the
    dual-path LSTMs (pass-through on padded steps = length-aware
    sequence reversal for the backward legs) and all norms, so
    bucket-padded forwards match exact-length ones to float tolerance
    (docs/PARITY.md round-5 fix; was 0.44 relative deviation)."""

    enc_channels: int = 64   # in_channels (encoder filters)
    dim: int = 64            # out_channels (bottleneck width)
    hidden: int = 128        # LSTM hidden
    kernel_size: int = 2
    chunk: int = 200         # K
    n_layers: int = 4
    num_spks: int = 2
    bidirectional: bool = True
    sample_rate: int = 16000

    @nn.compact
    def __call__(self, wav, lengths=None, deterministic: bool = True):
        b, t_in = wav.shape
        x = nn.Conv(self.enc_channels, (self.kernel_size,),
                    strides=(self.kernel_size // 2,), padding="VALID",
                    use_bias=False, name="encoder")(wav[..., None])
        x = jax.nn.relu(x)
        t = x.shape[1]
        mask = None
        if lengths is not None:
            stride = max(self.kernel_size // 2, 1)
            mask = _length_mask(
                jnp.clip((lengths - self.kernel_size) // stride + 1, 1, t), t)
            x = x * mask[..., None]
        h = _MaskedGN1(self.enc_channels, name="in_norm")(x, mask)
        h = nn.Dense(self.dim, use_bias=False, name="bottleneck")(h)
        seg, gap = _segment_ref(h, self.chunk)
        seg_mask = None
        if lengths is not None:
            stride = max(self.kernel_size // 2, 1)
            enc_lens = jnp.clip((lengths - self.kernel_size) // stride + 1,
                                1, t)
            seg_mask = _seg_valid_mask(enc_lens, t, self.chunk)
        for i in range(self.n_layers):
            seg = _DPRNNBlock(self.dim, self.hidden, self.bidirectional,
                              name=f"dp_{i}")(seg, seg_mask)
        seg = _PReLU(name="prelu")(seg)
        seg = nn.Dense(self.dim * self.num_spks, name="spk_expand")(seg)
        s, k = seg.shape[1], seg.shape[2]
        # (B, S, K, spks·N) → (B·spks, S, K, N), batch-major spk packing
        # exactly like the reference's view (dprnn.py:254-256)
        seg = seg.reshape(b, s, k, self.num_spks, self.dim)
        seg = seg.transpose(0, 3, 1, 2, 4).reshape(
            b * self.num_spks, s, k, self.dim)
        h = _over_add_ref(seg, gap)
        h = (jnp.tanh(nn.Dense(self.dim, name="out_tanh")(h))
             * jax.nn.sigmoid(nn.Dense(self.dim, name="out_sig")(h)))
        h = nn.Dense(self.enc_channels, use_bias=False, name="mask_proj")(h)
        m = jax.nn.relu(h).reshape(b, self.num_spks, t, self.enc_channels)
        dec = nn.ConvTranspose(1, (self.kernel_size,),
                               strides=(self.kernel_size // 2,),
                               padding="VALID", use_bias=False,
                               name="decoder")
        return _mask_decode(x, m.transpose(0, 2, 1, 3), dec,
                            self.num_spks, t_in)


class _GLNBDT(nn.Module):
    """Reference dptnet.py GlobalLayerNorm (shape='BDT'): normalize over
    (T, N) jointly with per-channel affine, eps = float32 machine eps.
    Input here is channels-last (B, T, N) — same element set."""

    dim: int
    eps: float = 1.1920929e-7

    @nn.compact
    def __call__(self, x, mask=None):
        # optional `mask` (B, T): statistics over valid frames only, so a
        # bucket-padded forward matches the exact-length one at this norm
        # (docs/PARITY.md "padded-bucket deviation"). Param names/shapes
        # are unchanged — torch port rules are unaffected, and with a
        # full mask this is numerically the unmasked reference norm.
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
        beta = self.param("beta", nn.initializers.zeros, (self.dim,))
        if mask is None:
            mean = jnp.mean(x, axis=(1, 2), keepdims=True)
            var = jnp.mean(jnp.square(x - mean), axis=(1, 2), keepdims=True)
            m = None
        else:
            m = mask.astype(x.dtype)[..., None]
            denom = jnp.maximum(
                jnp.sum(m, axis=(1, 2), keepdims=True) * x.shape[-1], 1.0)
            mean = jnp.sum(x * m, axis=(1, 2), keepdims=True) / denom
            var = jnp.sum(jnp.square(x - mean) * m,
                          axis=(1, 2), keepdims=True) / denom
        out = gamma * (x - mean) / jnp.sqrt(var + self.eps) + beta
        # padded frames are zeroed (not β-valued) so downstream chunking/
        # recurrence sees them as close to "absent" as static shapes allow
        return out if m is None else out * m


class _TorchMHA(nn.Module):
    """torch nn.MultiheadAttention with its packed in_proj parameters."""

    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):
        w = self.param("in_w", nn.initializers.lecun_normal(),
                       (3 * self.dim, self.dim))
        b = self.param("in_b", nn.initializers.zeros, (3 * self.dim,))
        wo = self.param("out_w", nn.initializers.lecun_normal(),
                        (self.dim, self.dim))
        bo = self.param("out_b", nn.initializers.zeros, (self.dim,))
        qkv = x @ w.T + b
        q, k, v = jnp.split(qkv, 3, axis=-1)
        bsz, t, n = x.shape
        h, dh = self.heads, self.dim // self.heads

        def sp(a):
            return a.reshape(bsz, t, h, dh).transpose(0, 2, 1, 3)

        q, k, v = sp(q), sp(k), sp(v)
        s = (q @ jnp.swapaxes(k, -1, -2)) / jnp.sqrt(dh).astype(x.dtype)
        o = (jax.nn.softmax(s, axis=-1) @ v).transpose(0, 2, 1, 3)
        return o.reshape(bsz, t, n) @ wo.T + bo


class _ImprovedTransformer(nn.Module):
    """Reference ImprovedTransformerLayer (dptnet.py:323-399): MHA +
    residual + gLN, then LSTM → relu → Linear feed-forward + residual +
    gLN (the DPTNet paper's RNN-augmented transformer)."""

    dim: int
    heads: int
    hidden: int
    bidirectional: bool = True

    @nn.compact
    def __call__(self, x):
        out = _TorchMHA(self.dim, self.heads, name="self_attn")(x) + x
        out = _GLNBDT(self.dim, name="norm_attn")(out)
        h = _TorchLSTM(self.hidden, self.bidirectional, name="rnn")(out)
        h = nn.Dense(self.dim, name="ff")(jax.nn.relu(h))
        return _GLNBDT(self.dim, name="norm_ff")(h + out)


def _split_unfold(x, seg: int):
    """Reference DPTNetSeparator.split_feature (dptnet.py:661-669):
    F.unfold with `seg` zero-padding on both sides and hop seg//2,
    channels-last: (B, T, N) → (B, S, seg, N)."""
    b, t, n = x.shape
    p = seg // 2
    xp = jnp.pad(x, ((0, 0), (seg, seg), (0, 0)))
    n_chunks = (t + seg) // p + 1
    idx = jnp.arange(seg)[None, :] + p * jnp.arange(n_chunks)[:, None]
    return xp[:, idx]


def _merge_fold(seg_x, length: int):
    """Reference merge_feature (dptnet.py:671-697): overlap-add fold ÷
    fold(ones), cropping the `seg`-wide padding."""
    b, s, k, n = seg_x.shape
    hop = k // 2
    width = length + 2 * k
    idx = (jnp.arange(k)[None, :] + hop * jnp.arange(s)[:, None]).reshape(-1)
    out = jnp.zeros((b, width, n), seg_x.dtype).at[:, idx].add(
        seg_x.reshape(b, -1, n))
    norm = jnp.zeros((width,), seg_x.dtype).at[idx].add(1.0)
    out = out / jnp.maximum(norm, 1e-8)[None, :, None]
    return out[:, k: k + length]


@register_model(name="DPTNet")
class DPTNet(nn.Module):
    """Dual-path transformer separator (Chen et al. 2020), faithful to
    the reference graph (dptnet.py:401-733): relu conv encoder, gLN,
    unfold segmentation, N×(intra,inter) improved-transformer layers
    (MHA + LSTM feed-forward), PReLU → spk-expand 1×1, fold overlap-add,
    tanh×sigmoid gate, relu masks on the (relu'd) encoder feature,
    transposed-conv decode. Loadable from a reference torch checkpoint
    via port_rules.convert_dptnet (forward parity in tests/test_convert
    .py). `lengths` masking is additive (norm stats include padding),
    exact at full length."""

    enc_channels: int = 64   # input_dim (must divide by `heads`)
    hidden: int = 128        # unit (LSTM hidden)
    heads: int = 4
    kernel_size: int = 16
    stride: int = 8
    chunk: int = 20          # segment_size
    n_layers: int = 6
    num_spks: int = 2
    bidirectional: bool = True
    sample_rate: int = 16000

    @nn.compact
    def __call__(self, wav, lengths=None, deterministic: bool = True):
        b, t_in = wav.shape
        x = nn.Conv(self.enc_channels, (self.kernel_size,),
                    strides=(self.stride,), padding="VALID",
                    use_bias=False, name="encoder")(wav[..., None])
        x = jax.nn.relu(x)
        t = x.shape[1]
        mask = None
        if lengths is not None:
            mask = _length_mask(
                jnp.clip((lengths - self.kernel_size) // self.stride + 1,
                         1, t), t)
            x = x * mask[..., None]
        h = _GLNBDT(self.enc_channels, name="enc_ln")(x, mask)
        seg = _split_unfold(h, self.chunk)
        for i in range(self.n_layers):
            bb, s, k, n = seg.shape
            intra = _ImprovedTransformer(
                self.enc_channels, self.heads, self.hidden, True,
                name=f"row_{i}")(seg.reshape(bb * s, k, n))
            seg = intra.reshape(bb, s, k, n)
            inter_in = seg.transpose(0, 2, 1, 3).reshape(bb * k, s, n)
            inter = _ImprovedTransformer(
                self.enc_channels, self.heads, self.hidden,
                self.bidirectional, name=f"col_{i}")(inter_in)
            seg = inter.reshape(bb, k, s, n).transpose(0, 2, 1, 3)
        seg = _PReLU(name="prelu")(seg)
        seg = nn.Dense(self.enc_channels * self.num_spks,
                       name="spk_expand")(seg)
        s, k = seg.shape[1], seg.shape[2]
        seg = seg.reshape(b, s, k, self.num_spks, self.enc_channels)
        seg = seg.transpose(0, 3, 1, 2, 4).reshape(
            b * self.num_spks, s, k, self.enc_channels)
        m = _merge_fold(seg, t)
        m = (jnp.tanh(nn.Dense(self.enc_channels, name="out_tanh")(m))
             * jax.nn.sigmoid(nn.Dense(self.enc_channels,
                                       name="out_sig")(m)))
        m = jax.nn.relu(m).reshape(b, self.num_spks, t, self.enc_channels)
        dec = nn.ConvTranspose(1, (self.kernel_size,),
                               strides=(self.stride,), padding="VALID",
                               use_bias=False, name="decoder")
        return _mask_decode(x, m.transpose(0, 2, 1, 3), dec,
                            self.num_spks, t_in)


class _CLNBDT(nn.Module):
    """Reference skim.py ChannelwiseLayerNorm (shape='BTD',
    skim.py:184-221): per-frame mean/biased-var over channels,
    eps = float32 machine eps. Input here is channels-last (B, T, C)."""

    dim: int
    eps: float = 1.1920929e-7

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
        beta = self.param("beta", nn.initializers.zeros, (self.dim,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        return gamma * (x - mean) / jnp.sqrt(var + self.eps) + beta


def _skim_norm(kind: str, dim: int, name: str):
    """choose_norm for SkiM (skim.py:131-147): gLN or cLN, shape BTD."""
    return (_GLNBDT if kind == "gLN" else _CLNBDT)(dim, name=name)


class _StatefulTorchLSTM(nn.Module):
    """One-layer torch-packed LSTM that threads explicit initial states
    and returns final states — SkiM chains its per-segment LSTMs through
    MemLSTMs via exactly these (h, c) tuples (skim.py:455-475). Same
    parameter packing as _TorchLSTM (gate order i,f,g,o; separate
    input/hidden biases) so the port_rules lstm() mapping applies."""

    hidden: int
    bidirectional: bool = False

    @nn.compact
    def __call__(self, x, h0, c0):  # x (B,T,N); h0,c0 (d,B,H)
        def run(xs, name, h_init, c_init):
            n = xs.shape[-1]
            wi = self.param(f"{name}_wi", nn.initializers.lecun_normal(),
                            (n, 4 * self.hidden))
            wh = self.param(f"{name}_wh", nn.initializers.lecun_normal(),
                            (self.hidden, 4 * self.hidden))
            bi = self.param(f"{name}_bi", nn.initializers.zeros,
                            (4 * self.hidden,))
            bh = self.param(f"{name}_bh", nn.initializers.zeros,
                            (4 * self.hidden,))
            xg = xs @ wi + bi + bh

            def step(carry, g_t):
                h, c = carry
                gates = g_t + h @ wh
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
                h = jax.nn.sigmoid(o) * jnp.tanh(c)
                return (h, c), h

            (hf, cf), hs = jax.lax.scan(
                step, (h_init, c_init), jnp.swapaxes(xg, 0, 1))
            return jnp.swapaxes(hs, 0, 1), hf, cf

        out, hf, cf = run(x, "fwd", h0[0], c0[0])
        if not self.bidirectional:
            return out, (hf[None], cf[None])
        outb, hb, cb = run(x[:, ::-1], "bwd", h0[1], c0[1])
        out = jnp.concatenate([out, outb[:, ::-1]], axis=-1)
        return out, (jnp.stack([hf, hb]), jnp.stack([cf, cb]))


class _SkiMSingleLSTM(nn.Module):
    """Reference SingleLSTM (skim.py:15-58): zero-init LSTM + linear
    projection back to the input width."""

    hidden: int
    bidirectional: bool

    @nn.compact
    def __call__(self, x):
        y = _TorchLSTM(self.hidden, self.bidirectional, name="lstm")(x)
        return nn.Dense(x.shape[-1], name="proj")(y)


class _SkiMSegLSTM(nn.Module):
    """Reference SegLSTM (skim.py:418-475): stateful LSTM over one
    segment's frames, projection, residual + norm; passes (h, c) on."""

    dim: int
    hidden: int
    bidirectional: bool
    norm_type: str

    @nn.compact
    def __call__(self, x, hc):
        out, hc_next = _StatefulTorchLSTM(
            self.hidden, self.bidirectional, name="lstm")(x, *hc)
        out = nn.Dense(self.dim, name="proj")(out)
        return x + _skim_norm(self.norm_type, self.dim, "norm")(out), hc_next


class _SkiMMemLSTM(nn.Module):
    """Reference MemLSTM (skim.py:286-388): LSTMs across the S segment
    boundary states of (h, c), residual + norm; in the causal
    (unidirectional) setup each segment receives the *previous*
    segment's memory (one-step shift with a zero first segment)."""

    hidden: int
    bidirectional: bool
    mem_type: str
    norm_type: str

    @nn.compact
    def __call__(self, h, c, s: int):
        d = 2 if self.bidirectional else 1
        dh = d * self.hidden
        bs = h.shape[1]
        b = bs // s
        if self.mem_type != "id":
            hB = h.transpose(1, 0, 2).reshape(b, s, dh)
            cB = c.transpose(1, 0, 2).reshape(b, s, dh)
            if self.mem_type in ("hc", "h"):
                hB = hB + _skim_norm(self.norm_type, dh, "h_norm")(
                    _SkiMSingleLSTM(self.hidden, self.bidirectional,
                                    name="h_net")(hB))
            if self.mem_type in ("hc", "c"):
                cB = cB + _skim_norm(self.norm_type, dh, "c_norm")(
                    _SkiMSingleLSTM(self.hidden, self.bidirectional,
                                    name="c_net")(cB))
            if self.mem_type == "h":
                cB = jnp.zeros_like(cB)
            if self.mem_type == "c":
                hB = jnp.zeros_like(hB)
            h = hB.reshape(bs, d, self.hidden).transpose(1, 0, 2)
            c = cB.reshape(bs, d, self.hidden).transpose(1, 0, 2)
        if not self.bidirectional:
            def shift(x):
                xB = x.transpose(1, 0, 2).reshape(b, s, dh)
                xB = jnp.pad(xB, ((0, 0), (1, 0), (0, 0)))[:, :-1]
                return xB.reshape(bs, d, self.hidden).transpose(1, 0, 2)

            h, c = shift(h), shift(c)
        return h, c


@register_model(name="SkiMNet")
class SkiMNet(nn.Module):
    """Skipping-memory LSTM separator (Li et al. 2022), faithful to the
    reference graph (skim.py:796-900): relu conv encoder; SkiM core =
    segment LSTMs whose (h, c) states chain through boundary-state
    MemLSTMs (skim.py:560-593), with the reference's always-pad-to-K
    segmentation quirk (skim.py:595-601 pads a full extra segment when
    T is already a multiple of K) and, for the non-causal/seg_overlap
    mode, the 50%-overlap split/merge (skim.py:76-128); PReLU → 1×1
    mask head; and the double encoder product reproduced verbatim —
    the separator returns masked = e·m (skim.py:756) and the wrapper
    then multiplies by e again (skim.py:887), so the decoder sees
    e²·m. Loadable from a reference torch checkpoint via
    port_rules.convert_skim (forward parity in tests/test_convert.py).
    `lengths` zero-pads masked frames additively; norm statistics then
    include the padding (the reference has no masking), so
    bucket-padded outputs are approximate — exact at full length."""

    enc_channels: int = 64       # input_dim
    hidden: int = 128            # unit
    kernel_size: int = 16
    chunk: int = 150             # segment_size
    n_layers: int = 3            # layer
    num_spks: int = 2
    causal: bool = True
    nonlinear: str = "relu"
    mem_type: str = "hc"
    seg_overlap: bool = False
    sample_rate: int = 16000

    @nn.compact
    def __call__(self, wav, lengths=None, deterministic: bool = True):
        b, t_in = wav.shape
        x = _EncDec.encode(wav, self.enc_channels, self.kernel_size)
        t = x.shape[1]
        if lengths is not None:
            stride = max(self.kernel_size // 2, 1)
            mask = _length_mask(
                jnp.clip((lengths - self.kernel_size) // stride + 1, 1, t), t)
            x = x * mask[..., None]
        dim = self.enc_channels
        bidir = not self.causal
        norm_type = "cLN" if self.causal else "gLN"
        k = self.chunk
        if self.seg_overlap:
            seg, gap = _segment_ref(x, k)              # (B, S, K, D)
        else:
            rest = k - t % k   # reference quirk: in (1..K], never 0
            seg = jnp.pad(x, ((0, 0), (0, rest), (0, 0))).reshape(
                b, -1, k, dim)
        s = seg.shape[1]
        out = seg.reshape(b * s, k, dim)
        nd = 2 if bidir else 1
        hc = (jnp.zeros((nd, b * s, self.hidden), x.dtype),
              jnp.zeros((nd, b * s, self.hidden), x.dtype))
        for i in range(self.n_layers):
            out, hc = _SkiMSegLSTM(dim, self.hidden, bidir, norm_type,
                                   name=f"seg_{i}")(out, hc)
            if self.mem_type and i < self.n_layers - 1:
                hc = _SkiMMemLSTM(self.hidden, bidir, self.mem_type,
                                  norm_type, name=f"mem_{i}")(
                    hc[0], hc[1], s)
        if self.seg_overlap:
            merged = _over_add_ref(out.reshape(b, s, k, dim), gap)
        else:
            merged = out.reshape(b, s * k, dim)[:, :t]
        merged = _PReLU(name="out_prelu")(merged)
        proj = nn.Dense(dim * self.num_spks, name="out_conv")(merged)
        nl = {"relu": jax.nn.relu, "sigmoid": jax.nn.sigmoid,
              "tanh": jnp.tanh}[self.nonlinear]
        m = nl(proj.reshape(b, t, dim, self.num_spks))
        # double product: _mask_decode multiplies by x once more, so
        # handing it e·m yields the reference's e²·m (skim.py:756, 887)
        masks_eff = m.transpose(0, 1, 3, 2) * x[:, :, None, :]
        dec = _EncDec.decode_module(self.kernel_size)
        return _mask_decode(x, masks_eff, dec, self.num_spks, t_in)


# ---------------- SuDoRM-RF ----------------


class _SuDOConvNorm(nn.Module):
    """Reference ConvNorm/ConvNormAct/DilatedConvNorm (sudormrf.py:46-156):
    conv (bias) → GlobLN(eps 1e-8) → optional PReLU."""

    nout: int
    k: int = 1
    stride: int = 1
    groups: int = 1
    act: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        p = (self.k - 1) // 2
        h = nn.Conv(self.nout, (self.k,), strides=(self.stride,),
                    padding=((p, p),), feature_group_count=self.groups,
                    use_bias=self.use_bias, name="conv")(x)
        h = _GLNBDT(self.nout, eps=1e-8, name="norm")(h)
        return _PReLU(name="act")(h) if self.act else h


class _SuDOBlock(nn.Module):
    """Reference UConvBlock (sudormrf.py:158-216): 1×1 expand, a
    depthwise downsampling pyramid (k=5, stride 2), nearest-neighbour
    upsample-and-add refolding, GlobLN+PReLU, 1×1 contract, residual."""

    out_channels: int
    in_channels: int
    depth: int = 4

    @nn.compact
    def __call__(self, x):
        residual = x
        h = _SuDOConvNorm(self.in_channels, 1, act=True, name="proj_1x1")(x)
        outs = [_SuDOConvNorm(self.in_channels, 5, 1, self.in_channels,
                              name="spp_0")(h)]
        for k in range(1, self.depth):
            outs.append(_SuDOConvNorm(self.in_channels, 5, 2,
                                      self.in_channels,
                                      name=f"spp_{k}")(outs[-1]))
        for _ in range(self.depth - 1):
            up = jnp.repeat(outs.pop(), 2, axis=1)  # nearest ×2
            outs[-1] = outs[-1] + up
        h = _GLNBDT(self.in_channels, eps=1e-8, name="final_norm")(outs[-1])
        h = _PReLU(name="final_act")(h)
        return nn.Dense(self.out_channels, name="res_conv")(h) + residual


@register_model(name="SuDORMRF")
class SuDORMRF(nn.Module):
    """Successive downsampling/resampling separator (Tzinis et al.
    2020), faithful to the reference graph (sudormrf.py:219-330):
    padded conv encoder, GlobLN + 1×1 bottleneck, U-ConvBlock stack,
    PReLU+1×1 relu mask on the raw encoder, grouped transposed-conv
    decode with the reference's padding/output_padding arithmetic.
    Loadable from a reference torch checkpoint via
    port_rules.convert_sudormrf (forward parity in tests/test_convert
    .py). `lengths` masking is additive (GlobLN stats then include
    padding) — exact at full length."""

    out_channels: int = 128     # bottleneck width
    in_channels: int = 512      # U-block inner width
    num_blocks: int = 16
    upsampling_depth: int = 4
    enc_kernel_size: int = 21
    enc_num_basis: int = 512
    num_sources: int = 2
    sample_rate: int = 16000

    @property
    def num_spks(self) -> int:
        return self.num_sources

    @nn.compact
    def __call__(self, wav, lengths=None, deterministic: bool = True):
        import math

        b, t_in = wav.shape
        k, s = self.enc_kernel_size, self.enc_kernel_size // 2
        lcm = abs(s * 2 ** self.upsampling_depth) // math.gcd(
            s, 2 ** self.upsampling_depth)
        pad = (-t_in) % lcm
        x = jnp.pad(wav, ((0, 0), (0, pad)))
        x = nn.Conv(self.enc_num_basis, (k,), strides=(s,),
                    padding=((s, s),), use_bias=False,
                    name="encoder")(x[..., None])
        t = x.shape[1]
        mask = None
        if lengths is not None:
            mask = _length_mask(
                jnp.clip((lengths + 2 * s - k) // s + 1, 1, t), t)
            x = x * mask[..., None]
        h = _GLNBDT(self.enc_num_basis, eps=1e-8, name="ln")(x, mask)
        h = nn.Dense(self.out_channels, name="bottleneck")(h)
        for i in range(self.num_blocks):
            h = _SuDOBlock(self.out_channels, self.in_channels,
                           self.upsampling_depth, name=f"sm_{i}")(h)
        h = _PReLU(name="mask_prelu")(h)
        m = nn.Dense(self.num_sources * self.enc_num_basis,
                     name="mask_conv")(h)
        m = jax.nn.relu(
            m.reshape(b, t, self.num_sources, self.enc_num_basis))
        est = (m * x[:, :, None, :]).reshape(b, t, -1)
        y = nn.ConvTranspose(self.num_sources, (k,), strides=(s,),
                             padding="VALID", use_bias=False,
                             name="decoder")(est)  # (B, L_full, spk)
        # torch ConvTranspose1d(padding=s, output_padding=s-1): crop s
        # from the left and s-(s-1)=1 from the right of the full output
        y = y[:, s: y.shape[1] - 1]
        return jnp.swapaxes(y, 1, 2)[..., :t_in]


# ---------------- TDANet ----------------


def _adaptive_avg_pool(x, size: int):
    """torch F.adaptive_avg_pool1d for exact-multiple lengths (the only
    case TDANet's lcm padding produces), channels-last (B, T, C)."""
    t = x.shape[1]
    assert t % size == 0, f"adaptive pool {t}->{size} not exact"
    return x.reshape(x.shape[0], size, t // size, x.shape[-1]).mean(axis=2)


def _sinusoid_pe(t: int, dim: int, dtype):
    """Reference tdanet.py PositionalEncoding buffer (:220-239)."""
    import math

    pos = jnp.arange(t, dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, dim, 2, dtype=jnp.float32)
                  * -(math.log(10000.0) / dim))
    pe = jnp.zeros((t, dim), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
    return pe.astype(dtype)


class _TDAGlobalAttention(nn.Module):
    """Reference tdanet.py GlobalAttention (:260-271): pre-LN + sinusoid
    PE + torch MHA with the reference's residual quirk
    (norm(out + dropout(out)) == norm(2·out) at eval — the residual uses
    the attention OUTPUT, not the input), then a ConvNorm/dwconv Mlp."""

    dim: int
    heads: int = 8

    @nn.compact
    def __call__(self, x):  # (B, T, N)
        h = nn.LayerNorm(name="attn_in_norm")(x)
        h = h + _sinusoid_pe(h.shape[1], self.dim, h.dtype)[None]
        # reference quirk (tdanet.py:252-257): the (B, T, N) tensor is
        # fed to seq-first nn.MultiheadAttention WITHOUT the (T, B, N)
        # permute DPTNet does — torch therefore attends over the BATCH
        # axis per time step; reproduced exactly
        h = jnp.swapaxes(_TorchMHA(self.dim, self.heads, name="attn")(
            jnp.swapaxes(h, 0, 1)), 0, 1)
        h = nn.LayerNorm(name="attn_norm")(h + h)
        x = x + h
        m = _SuDOConvNorm(self.dim * 2, 1, use_bias=False,
                          name="mlp_fc1")(x)
        m = nn.Conv(self.dim * 2, (5,), padding=((2, 2),),
                    feature_group_count=self.dim * 2, use_bias=True,
                    name="mlp_dwconv")(m)
        m = jax.nn.relu(m)
        m = _SuDOConvNorm(self.dim, 1, use_bias=False, name="mlp_fc2")(m)
        return x + m


class _Injection(nn.Module):
    """Reference InjectionMulti / InjectionMultiSum (:273-323): gated
    local/global fusion with nearest interpolation of the global path.
    Depthwise when inp == oup (the only configuration TDANet builds)."""

    dim: int
    k: int = 1
    with_sum: bool = False

    @nn.compact
    def __call__(self, x_l, x_g):
        t = x_l.shape[1]
        local = _SuDOConvNorm(self.dim, self.k, groups=self.dim,
                              use_bias=False, name="local_embedding")(x_l)
        gate = _SuDOConvNorm(self.dim, self.k, groups=self.dim,
                             use_bias=False, name="global_act")(x_g)
        out = local * _interp_nearest(jax.nn.sigmoid(gate), t)
        if self.with_sum:
            glob = _SuDOConvNorm(self.dim, self.k, groups=self.dim,
                                 use_bias=False,
                                 name="global_embedding")(x_g)
            out = out + _interp_nearest(glob, t)
        return out


class _TDABlock(nn.Module):
    """Reference tdanet.py UConvBlock (:325-411): depthwise pyramid,
    adaptive-avg-pooled global summary through GlobalAttention, per-level
    gated injection, and the reference's exact top-down refold (including
    its `x_fused[i-1]` seed at i == depth-2)."""

    out_channels: int
    in_channels: int
    depth: int = 4

    @nn.compact
    def __call__(self, x):
        residual = x
        c = self.in_channels
        h = _SuDOConvNorm(c, 1, act=True, name="proj_1x1")(x)
        outs = [_SuDOConvNorm(c, 5, 1, c, name="spp_0")(h)]
        for k in range(1, self.depth):
            outs.append(_SuDOConvNorm(c, 5, 2, c,
                                      name=f"spp_{k}")(outs[-1]))
        t_last = outs[-1].shape[1]
        g = sum(_adaptive_avg_pool(f, t_last) for f in outs)
        g = _TDAGlobalAttention(c, name="globalatt")(g)
        fused = [_Injection(c, 1, with_sum=False, name=f"fus_{i}")(
            outs[i], g) for i in range(self.depth)]
        expanded = None
        for i in range(self.depth - 2, -1, -1):
            src = fused[i - 1] if i == self.depth - 2 else expanded
            expanded = _Injection(c, 5, with_sum=True,
                                  name=f"last_{i}")(fused[i], src)
        return nn.Dense(self.out_channels, name="res_conv")(expanded) \
            + residual


@register_model(name="TDANet")
class TDANet(nn.Module):
    """Top-down attention pyramid separator (Li et al. 2023), faithful
    to the reference graph (tdanet.py:434-557): ms-denominated encoder
    kernel (enc_kernel_size·sr/1000 samples, stride k/4, basis k/2+1),
    the reference's pad_input scheme, GlobLN + 1×1 bottleneck, recurrent
    shared-weight UConvBlocks with mixture re-injection, PReLU+1×1 relu
    masks, transposed-conv decode with the reference's exact crop
    arithmetic. Loadable from a reference torch checkpoint via
    port_rules.convert_tdanet (forward parity in tests/test_convert.py)."""

    out_channels: int = 128
    in_channels: int = 512
    num_blocks: int = 16       # recurrence count (shared weights)
    upsampling_depth: int = 4
    enc_kernel_size: int = 21  # milliseconds (reference convention)
    num_sources: int = 2
    sample_rate: int = 16000

    @property
    def num_spks(self) -> int:
        return self.num_sources

    @nn.compact
    def __call__(self, wav, lengths=None, deterministic: bool = True):
        b, t_in = wav.shape
        k = self.enc_kernel_size * self.sample_rate // 1000
        s = k // 4
        basis = k // 2 + 1
        # reference pad_input: end-pad `rest`, then (k - s) both sides
        # (rest can equal k — the reference pads a full window then)
        rest = k - (s + t_in % k) % k
        x = jnp.pad(wav, ((0, 0), (k - s, rest + (k - s))))
        x = nn.Conv(basis, (k,), strides=(s,), padding=((k // 2, k // 2),),
                    use_bias=False, name="encoder")(x[..., None])
        t = x.shape[1]
        mask = None
        if lengths is not None:
            mask = _length_mask(jnp.clip(
                (lengths + 2 * (k - s) + 2 * (k // 2) - k) // s + 1,
                1, t), t)
            x = x * mask[..., None]
        h = _GLNBDT(basis, eps=1e-8, name="ln")(x, mask)
        h = nn.Dense(self.out_channels, name="bottleneck")(h)
        block = _TDABlock(self.out_channels, self.in_channels,
                          self.upsampling_depth, name="unet")
        concat_conv = nn.Conv(self.out_channels, (1,),
                              feature_group_count=self.out_channels,
                              use_bias=True, name="concat_conv")
        concat_act = _PReLU(name="concat_act")
        mixture = h
        for i in range(self.num_blocks):
            h = block(h if i == 0 else concat_act(concat_conv(mixture + h)))
        h = _PReLU(name="mask_prelu")(h)
        m = nn.Dense(self.num_sources * basis, name="mask_conv")(h)
        m = jax.nn.relu(m.reshape(b, t, self.num_sources, basis))
        est = (m * x[:, :, None, :]).reshape(b, t, -1)
        y = nn.ConvTranspose(self.num_sources, (k,), strides=(s,),
                             padding="VALID", use_bias=False,
                             name="decoder")(est)
        # torch decoder padding=k//2 crops k//2 both sides; then the
        # forward crops [k-s : -(rest + k - s)]
        y = y[:, k // 2: y.shape[1] - k // 2]
        y = y[:, (k - s): y.shape[1] - (rest + (k - s))]
        return jnp.swapaxes(y, 1, 2)[..., :t_in]


# ---------------- BSRNN ----------------


class _ResRNN(nn.Module):
    """Reference bsrnn.py ResRNN: GroupNorm(1) → BiLSTM → Linear, with a
    residual around the whole block. Channels-last (B, T, dim)."""

    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x):
        h = _GLNBDT(self.dim, name="norm")(x)
        h = _TorchLSTM(self.hidden, True, name="rnn")(h)
        return x + nn.Dense(self.dim, name="proj")(h)


class _GroupedDense(nn.Module):
    """torch Conv1d(groups·in → groups·out, 1, groups=groups) with
    torch's channel-major group layout preserved exactly."""

    groups: int
    in_per: int
    out_per: int

    @nn.compact
    def __call__(self, x):  # (B, T, groups·in_per)
        w = self.param("w", nn.initializers.lecun_normal(),
                       (self.groups, self.in_per, self.out_per))
        b = self.param("b", nn.initializers.zeros,
                       (self.groups, self.out_per))
        bs, t, _ = x.shape
        h = x.reshape(bs, t, self.groups, self.in_per)
        h = jnp.einsum("btgi,gio->btgo", h, w) + b
        return h.reshape(bs, t, self.groups * self.out_per)


def bsrnn_band_widths(sample_rate: int, enc_dim: int) -> list:
    """The reference's music band plan (bsrnn.py:63-73): 20×50 Hz,
    10×100 Hz, 8×250 Hz, 8×500 Hz, remainder tail."""
    import numpy as _np

    widths = []
    for hz, n in ((50, 20), (100, 10), (250, 8), (500, 8)):
        widths += [int(_np.floor(hz / (sample_rate / 2.0) * enc_dim))] * n
    widths.append(enc_dim - int(_np.sum(widths)))
    return widths


@register_model(name="BSRNN")
class BSRNN(nn.Module):
    """Band-split RNN (Yu et al. 2022), faithful to the reference graph
    (bsrnn.py:50-179): torch-compatible STFT, the reference's 47-band
    music split, per-band GroupNorm+1×1 bottleneck, num_repeat BSNet
    layers (band-time ResRNN + band-comm ResRNN), per-band grouped-conv
    mask heads with tanh×sigmoid gating and the sum-to-one mask
    normalization, complex mask multiply, iSTFT. Loadable from a
    reference torch checkpoint via port_rules.convert_bsrnn (forward
    parity in tests/test_convert.py). Returns (B, num_output, T)."""

    sample_rate: int = 44100
    win: int = 2048
    stride: int = 512
    feature_dim: int = 128
    num_repeat: int = 12
    num_output: int = 4
    # zoo-contract alias: the separator API reads num_spks
    num_spks: int = 4

    @nn.compact
    def __call__(self, wav, lengths=None, deterministic: bool = True):
        b, t_in = wav.shape
        enc_dim = self.win // 2 + 1
        widths = bsrnn_band_widths(self.sample_rate, enc_dim)
        assert min(widths) >= 1, (
            f"BSRNN band plan degenerates at sr={self.sample_rate}, "
            f"win={self.win}: {widths}")
        nband, n, k = len(widths), self.feature_dim, self.num_output
        spec = stft(wav, self.win, self.stride)  # (B, F, T) complex
        tt = spec.shape[-1]
        spec_t = jnp.swapaxes(spec, 1, 2)  # (B, T, F)
        feats = []
        bi = 0
        for i, bw in enumerate(widths):
            sb = spec_t[..., bi: bi + bw]
            # torch stacks [real, imag] on a leading axis then flattens
            # (B, 2, bw, T) → (B, 2·bw, T): real block first
            ri = jnp.concatenate([sb.real, sb.imag], axis=-1)  # (B,T,2bw)
            h = _GLNBDT(2 * bw, name=f"bn_{i}_norm")(ri)
            feats.append(nn.Dense(n, name=f"bn_{i}_proj")(h))
            bi += bw
        h = jnp.stack(feats, axis=1)  # (B, nband, T, N)
        for r in range(self.num_repeat):
            y = _ResRNN(n, 2 * n, name=f"sep_{r}_band_rnn")(
                h.reshape(b * nband, tt, n)).reshape(b, nband, tt, n)
            z = y.transpose(0, 2, 1, 3).reshape(b * tt, nband, n)
            z = _ResRNN(n, 2 * n, name=f"sep_{r}_band_comm")(z)
            h = z.reshape(b, tt, nband, n).transpose(0, 2, 1, 3)
        est_bands = []
        bi = 0
        for i, bw in enumerate(widths):
            x = h[:, i]  # (B, T, N)
            x = _GLNBDT(n, name=f"mask_{i}_norm")(x)
            x = jnp.tanh(nn.Dense(n * k, name=f"mask_{i}_pre")(x))
            x = jnp.tanh(_GroupedDense(k, n, 2 * n, name=f"mask_{i}_g1")(x))
            x = _GroupedDense(k, 2 * n, 4 * bw, name=f"mask_{i}_g2")(x)
            o = x.reshape(b, tt, 2, 2, k, bw)
            m = o[:, :, 0] * jax.nn.sigmoid(o[:, :, 1])  # (B,T,2,K,bw)
            mr, mi = m[:, :, 0], m[:, :, 1]  # (B,T,K,bw)
            mr = mr - (jnp.sum(mr, axis=2, keepdims=True) - 1.0) / k
            mi = mi - jnp.sum(mi, axis=2, keepdims=True) / k
            sb = spec_t[..., bi: bi + bw][:, :, None]  # (B,T,1,bw)
            est = ((sb.real * mr - sb.imag * mi)
                   + 1j * (sb.real * mi + sb.imag * mr))
            est_bands.append(est)
            bi += bw
        est = jnp.concatenate(est_bands, axis=-1)  # (B, T, K, F)
        est = est.transpose(0, 2, 3, 1).reshape(b * k, enc_dim, tt)
        wavs = istft(est, self.win, self.stride, length=t_in)
        return wavs.reshape(b, k, t_in)


# ---------------- TFGridNet ----------------


class _LN4DCF(nn.Module):
    """Reference LayerNormalization4DCF (TFGNet.py:735-756): normalize
    over (C, F) per (B, T), biased variance, eps inside the sqrt;
    affine gamma/beta (1,C,1,F) stored channels-last as (F, C).
    Input here is (B, T, F, C)."""

    dim: int
    n_freqs: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones,
                           (self.n_freqs, self.dim))
        beta = self.param("beta", nn.initializers.zeros,
                          (self.n_freqs, self.dim))
        mu = jnp.mean(x, axis=(2, 3), keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=(2, 3), keepdims=True)
        return (x - mu) / jnp.sqrt(var + self.eps) * gamma + beta


class _AllHeadPReLULN4DCF(nn.Module):
    """Reference AllHeadPReLULayerNormalization4DCF (TFGNet.py:759-786):
    per-head PReLU (num_parameters=H), then normalize over (E, F) per
    (B, H, T); gamma/beta (1,H,E,1,F) stored channels-last as
    (F, H, E). Input here is (B, T, F, H, E)."""

    heads: int
    e_dim: int
    n_freqs: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(0.25),
                           (self.heads,))
        a = alpha[None, None, None, :, None]
        x = jnp.maximum(x, 0) + a * jnp.minimum(x, 0)
        gamma = self.param("gamma", nn.initializers.ones,
                           (self.n_freqs, self.heads, self.e_dim))
        beta = self.param("beta", nn.initializers.zeros,
                          (self.n_freqs, self.heads, self.e_dim))
        mu = jnp.mean(x, axis=(2, 4), keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=(2, 4), keepdims=True)
        # x is (B,T,F,H,E); (F,H,E) params broadcast as (1,1,F,H,E)
        return (x - mu) / jnp.sqrt(var + self.eps) * gamma + beta


class _GridNetV2Block(nn.Module):
    """Reference GridNetV2Block (TFGNet.py:539-732) in channels-last
    (B, T, F, C): pad/unfold (channel-major windows) → BiLSTM →
    transposed-conv refold for the intra (frequency) and inter (time)
    paths, then full-band T×T softmax attention with per-head
    PReLU-LayerNorm'd 1×1 Q/K/V heads and the (C,F)-normalized output
    projection."""

    emb_dim: int
    emb_ks: int
    emb_hs: int
    n_freqs: int
    hidden: int
    n_head: int = 4
    approx_qk_dim: int = 512
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        b, old_t, old_q, c = x.shape
        ks, hs = self.emb_ks, self.emb_hs
        olp = ks - hs
        t_pad = -(-(old_t + 2 * olp - ks) // hs) * hs + ks
        q_pad = -(-(old_q + 2 * olp - ks) // hs) * hs + ks
        x = jnp.pad(x, ((0, 0), (olp, t_pad - old_t - olp),
                        (olp, q_pad - old_q - olp), (0, 0)))

        def unfold(seq):
            # (N, L, C) → (N, n_win, C·ks), feature index c·ks + k —
            # torch F.unfold's channel-major packing (TFGNet.py:656-659)
            n, l, cc = seq.shape
            nw = (l - ks) // hs + 1
            parts = [seq[:, k: k + (nw - 1) * hs + 1: hs]
                     for k in range(ks)]
            w = jnp.stack(parts, axis=-1)           # (N, nw, C, ks)
            return w.reshape(n, nw, cc * ks)

        def path(h, n_outer, l, rnn_name, lin_name):
            # h: (N_outer·?, L, C) sequence; returns (N_outer, L, C)
            if ks == hs:
                hh = h.reshape(h.shape[0], l // ks, ks * c)
                hh = _TorchLSTM(self.hidden, True, name=rnn_name)(hh)
                hh = nn.Dense(ks * c, name=lin_name)(hh)
                return hh.reshape(h.shape[0], l, c)
            hh = unfold(h)
            hh = _TorchLSTM(self.hidden, True, name=rnn_name)(hh)
            return nn.ConvTranspose(c, (ks,), strides=(hs,),
                                    padding="VALID", name=lin_name)(hh)

        # intra (over frequency)
        h = nn.LayerNorm(epsilon=self.eps, name="intra_norm")(x)
        h = path(h.reshape(b * t_pad, q_pad, c), b * t_pad, q_pad,
                 "intra_rnn", "intra_linear")
        x = x + h.reshape(b, t_pad, q_pad, c)
        # inter (over time)
        h = nn.LayerNorm(epsilon=self.eps, name="inter_norm")(x)
        h = h.transpose(0, 2, 1, 3).reshape(b * q_pad, t_pad, c)
        h = path(h, b * q_pad, t_pad, "inter_rnn", "inter_linear")
        x = x + h.reshape(b, q_pad, t_pad, c).transpose(0, 2, 1, 3)
        x = x[:, olp: olp + old_t, olp: olp + old_q]

        # full-band attention over frames
        e_dim = -(-self.approx_qk_dim // self.n_freqs)  # ceil, :582-584
        cv = c // self.n_head
        q = nn.Dense(self.n_head * e_dim, name="attn_conv_Q")(x)
        q = _AllHeadPReLULN4DCF(self.n_head, e_dim, self.n_freqs,
                                self.eps, name="attn_norm_Q")(
            q.reshape(b, old_t, old_q, self.n_head, e_dim))
        k = nn.Dense(self.n_head * e_dim, name="attn_conv_K")(x)
        k = _AllHeadPReLULN4DCF(self.n_head, e_dim, self.n_freqs,
                                self.eps, name="attn_norm_K")(
            k.reshape(b, old_t, old_q, self.n_head, e_dim))
        v = nn.Dense(self.n_head * cv, name="attn_conv_V")(x)
        v = _AllHeadPReLULN4DCF(self.n_head, cv, self.n_freqs,
                                self.eps, name="attn_norm_V")(
            v.reshape(b, old_t, old_q, self.n_head, cv))

        def flat(z, e):
            # (B,T,F,H,E) → (B·H, T, E·F), row-major (E, F) flatten
            return z.transpose(0, 3, 1, 4, 2).reshape(
                b * self.n_head, old_t, e * old_q)

        qf, kf, vf = flat(q, e_dim), flat(k, e_dim), flat(v, cv)
        attn = jax.nn.softmax(
            qf @ jnp.swapaxes(kf, 1, 2)
            / jnp.sqrt(jnp.asarray(e_dim * old_q, x.dtype)), axis=-1)
        out = attn @ vf                          # (B·H, T, Cv·F)
        out = out.reshape(b, self.n_head, old_t, cv, old_q)
        out = out.transpose(0, 2, 4, 1, 3).reshape(
            b, old_t, old_q, self.n_head * cv)  # channel = h·Cv + c
        out = nn.Dense(c, name="attn_proj")(out)
        out = _PReLU(name="attn_act")(out)
        out = _LN4DCF(c, self.n_freqs, self.eps, name="attn_ln")(out)
        return out + x


@register_model(name="TFGridNet")
class TFGridNet(nn.Module):
    """TF-GridNet separator (Wang et al. 2023), faithful to the
    reference graph (TFGNet.py:352-536): unbiased-std input
    normalization, center/reflect hann STFT (n_fft win, `stride` hop),
    3×3 conv + GroupNorm(1) embedding, n_layers GridNetV2 blocks
    (intra-frequency/inter-time unfolded BiLSTMs + full-band T×T
    attention), 3×3 transposed-conv to per-source real/imag spectra,
    iSTFT, and the std denormalization. Loadable from a reference
    torch checkpoint via port_rules.convert_tfgridnet (forward parity
    in tests/test_convert.py). `lengths` masks STFT frames exactly as
    the reference's Stft olens masked_fill (stft_tfgn.py:171-180); the
    std normalization still spans padding, so bucket-padded outputs
    are approximate — exact at full length."""

    n_srcs: int = 2
    n_fft: int = 128
    stride: int = 64
    n_layers: int = 6
    lstm_hidden_units: int = 192
    attn_n_head: int = 4
    attn_approx_qk_dim: int = 512
    emb_dim: int = 48
    emb_ks: int = 4
    emb_hs: int = 1
    eps: float = 1e-5
    sample_rate: int = 16000

    # registry/back-compat aliases used by earlier configs
    @property
    def num_spks(self):
        return self.n_srcs

    @nn.compact
    def __call__(self, wav, lengths=None, deterministic: bool = True):
        b, t_in = wav.shape
        # torch.std over (T, M) is Bessel-corrected (TFGNet.py:495)
        mix_std = jnp.std(wav, axis=1, keepdims=True, ddof=1)
        xw = wav / mix_std
        spec = stft(xw, self.n_fft, self.stride)   # (B, F, T) complex
        f, tt = spec.shape[1], spec.shape[2]
        if lengths is not None:
            pad = self.n_fft // 2
            olens = (lengths + 2 * pad - self.n_fft) // self.stride + 1
            spec = spec * _length_mask(jnp.clip(olens, 1, tt), tt)[:, None]
        x = jnp.stack([spec.real, spec.imag], axis=-1)  # (B, F, T, 2)
        x = x.transpose(0, 2, 1, 3)                     # (B, T, F, 2)
        x = nn.Conv(self.emb_dim, (3, 3), padding=((1, 1), (1, 1)),
                    name="conv")(x)
        x = nn.GroupNorm(num_groups=1, epsilon=self.eps,
                         name="conv_norm")(x)
        for i in range(self.n_layers):
            x = _GridNetV2Block(
                self.emb_dim, self.emb_ks, self.emb_hs, f,
                self.lstm_hidden_units, self.attn_n_head,
                self.attn_approx_qk_dim, self.eps, name=f"block_{i}")(x)
        x = nn.ConvTranspose(self.n_srcs * 2, (3, 3), padding="VALID",
                             name="deconv")(x)
        x = x[:, 1:-1, 1:-1]      # torch deconv padding=(1,1) crop
        x = x.reshape(b, tt, f, self.n_srcs, 2)
        est = x[..., 0] + 1j * x[..., 1]                # (B, T, F, S)
        est = est.transpose(0, 3, 2, 1).reshape(b * self.n_srcs, f, tt)
        wavs = istft(est, self.n_fft, self.stride, length=t_in)
        wavs = wavs.reshape(b, self.n_srcs, t_in)
        return wavs * mix_std[:, None]


# ---------------- MossFormer (v1) ----------------


@register_model(name="MossFormer")
class MossFormer(nn.Module):
    """MossFormer v1 (look2hear mossformer.py:476): the MossFormer2
    architecture WITHOUT the interleaved gated-FSMN blocks — a pure stack
    of FLASH shared-A attention blocks between the conv encoder/decoder.
    Implemented by composing the separation module's pieces."""

    dim: int = 512
    enc_channels: int = 512
    num_blocks: int = 24
    kernel_size: int = 16
    num_spks: int = 2
    group_size: int = 256
    qk_dim: int = 128
    sample_rate: int = 16000

    @nn.compact
    def __call__(self, wav, lengths=None, deterministic: bool = True):
        from .separation import FlashBlock, GlobalLayerNorm

        b, t_in = wav.shape
        if lengths is None:
            lengths = jnp.full((b,), t_in)
        stride = self.kernel_size // 2
        x = nn.Conv(self.enc_channels, (self.kernel_size,), strides=(stride,),
                    padding="VALID", use_bias=False, name="encoder")(
            wav[..., None])
        x = jax.nn.relu(x)
        t_enc = x.shape[1]
        pad = (-t_enc) % self.group_size
        xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        t_pad = t_enc + pad
        enc_lengths = jnp.clip(
            (lengths - self.kernel_size) // stride + 1, 1, t_enc)
        mask = (jnp.arange(t_pad)[None, :] < enc_lengths[:, None]).astype(
            x.dtype)
        h = GlobalLayerNorm(self.enc_channels, name="in_norm")(xp, mask)
        h = nn.Dense(self.dim, use_bias=False, name="bottleneck")(h)
        for i in range(self.num_blocks):
            h = FlashBlock(dim=self.dim, group_size=self.group_size,
                           qk_dim=self.qk_dim, name=f"flash_{i}")(
                h, mask, deterministic)
        h = nn.LayerNorm(name="out_ln")(h)
        m = nn.Dense(self.enc_channels * self.num_spks, name="mask_out")(
            jax.nn.relu(h))
        m = jax.nn.relu(m).reshape(b, t_pad, self.num_spks, self.enc_channels)
        m = m[:, :t_enc]
        dec = _EncDec.decode_module(self.kernel_size)
        return _mask_decode(x, m, dec, self.num_spks, t_in)


# ---------------- A-FRCNN ----------------


def _interp_nearest(x, size: int):
    """torch F.interpolate(mode='nearest') on the time axis of a
    channels-last (B, T, C) tensor: src = floor(dst * T / size)."""
    t = x.shape[1]
    idx = (jnp.arange(size) * t) // size
    return x[:, idx]


class _AFRCNNBlock(nn.Module):
    """Reference afrcnn.py Blocks (:157-237): 1×1 expand, depthwise k=5
    stride-2 pyramid, asynchronous neighbour fusion (down(i−1) ‖ i ‖
    nearest-up(i+1) → 1×1), all-level nearest collapse, 1×1 contract,
    residual. Reuses _SuDOConvNorm — AFRCNN and SuDoRM-RF share the same
    ConvNormAct/DilatedConvNorm primitives in the reference."""

    out_channels: int
    in_channels: int
    depth: int = 4

    @nn.compact
    def __call__(self, x):
        residual = x
        c = self.in_channels
        h = _SuDOConvNorm(c, 1, act=True, name="proj_1x1")(x)
        outs = [_SuDOConvNorm(c, 5, 1, c, name="spp_0")(h)]
        for k in range(1, self.depth):
            outs.append(_SuDOConvNorm(c, 5, 2, c,
                                      name=f"spp_{k}")(outs[-1]))
        fused = []
        for i in range(self.depth):
            parts = []
            if i - 1 >= 0:
                parts.append(_SuDOConvNorm(c, 5, 2, c,
                                           name=f"fuse_{i}")(outs[i - 1]))
            parts.append(outs[i])
            if i + 1 < self.depth:
                parts.append(_interp_nearest(outs[i + 1],
                                             outs[i].shape[1]))
            y = jnp.concatenate(parts, axis=-1)
            fused.append(_SuDOConvNorm(c, 1, act=True,
                                       name=f"concat_{i}")(y))
        full = outs[0].shape[1]
        cat = jnp.concatenate(
            [fused[0]] + [_interp_nearest(f, full) for f in fused[1:]],
            axis=-1)
        h = _SuDOConvNorm(c, 1, act=True, name="last")(cat)
        return nn.Dense(self.out_channels, name="res_conv")(h) + residual


@register_model(name="AFRCNN")
class AFRCNN(nn.Module):
    """Asynchronous fully recurrent CNN separator (Hu et al. 2021),
    faithful to the reference graph (afrcnn.py:239-372): the SuDoRM-RF
    front/back end (lcm padding, padded conv encoder, GlobLN + 1×1
    bottleneck, PReLU+1×1 relu masks, padding/output_padding transposed-
    conv decode) around a Recurrent separation module — ONE Blocks
    module applied `num_blocks` times with shared weights, re-injecting
    the bottleneck mixture through a depthwise-1×1+PReLU concat block on
    every iteration after the first. Loadable from a reference torch
    checkpoint via port_rules.convert_afrcnn (forward parity in
    tests/test_convert.py)."""

    out_channels: int = 128
    in_channels: int = 512
    num_blocks: int = 16       # recurrence count (shared weights)
    upsampling_depth: int = 4
    enc_kernel_size: int = 21
    enc_num_basis: int = 512
    num_sources: int = 2
    sample_rate: int = 16000

    @property
    def num_spks(self) -> int:
        return self.num_sources

    @nn.compact
    def __call__(self, wav, lengths=None, deterministic: bool = True):
        import math

        b, t_in = wav.shape
        k, s = self.enc_kernel_size, self.enc_kernel_size // 2
        lcm = abs(s * 2 ** self.upsampling_depth) // math.gcd(
            s, 2 ** self.upsampling_depth)
        pad = (-t_in) % lcm
        x = jnp.pad(wav, ((0, 0), (0, pad)))
        x = nn.Conv(self.enc_num_basis, (k,), strides=(s,),
                    padding=((s, s),), use_bias=False,
                    name="encoder")(x[..., None])
        t = x.shape[1]
        mask = None
        if lengths is not None:
            mask = _length_mask(
                jnp.clip((lengths + 2 * s - k) // s + 1, 1, t), t)
            x = x * mask[..., None]
        h = _GLNBDT(self.enc_num_basis, eps=1e-8, name="ln")(x, mask)
        h = nn.Dense(self.out_channels, name="bottleneck")(h)
        block = _AFRCNNBlock(self.out_channels, self.in_channels,
                             self.upsampling_depth, name="blocks")
        concat_conv = nn.Conv(self.out_channels, (1,),
                              feature_group_count=self.out_channels,
                              use_bias=True, name="concat_conv")
        concat_act = _PReLU(name="concat_act")
        mixture = h
        for i in range(self.num_blocks):  # shared weights (Recurrent)
            h = block(h if i == 0 else concat_act(concat_conv(mixture + h)))
        h = _PReLU(name="mask_prelu")(h)
        m = nn.Dense(self.num_sources * self.enc_num_basis,
                     name="mask_conv")(h)
        m = jax.nn.relu(
            m.reshape(b, t, self.num_sources, self.enc_num_basis))
        est = (m * x[:, :, None, :]).reshape(b, t, -1)
        y = nn.ConvTranspose(self.num_sources, (k,), strides=(s,),
                             padding="VALID", use_bias=False,
                             name="decoder")(est)
        y = y[:, s: y.shape[1] - 1]
        return jnp.swapaxes(y, 1, 2)[..., :t_in]


# ---------------------------------------------------------------------------
# Padded-bucket safety registry (VERDICT r4 ask 4).
#
# Measured max relative deviation between a bucket-padded forward (with
# `lengths` set) and the exact-length forward, per arch — the numbers in
# docs/PARITY.md ("Padded-bucket deviation per zoo arch"), re-checked
# each CI run by tests/test_zoo.py::test_padded_bucket_deviation. Archs
# above PAD_SAFE_THRESHOLD are NOT safe to dispatch through a bucket
# ladder: engines must auto-route them to exact-length compilation
# (one XLA program per distinct length) instead of silently returning
# up-to-44%-off audio.

PADDED_BUCKET_DEVIATION = {
    "MossFormer2": 0.0,      # masked norms + masked attention throughout
    "ConvTasNet": 3.5e-7,    # masked gLN throughout
    "SkiMNet": 0.0,          # pad-full-segment scheme isolates padding
    "DPRNNTasNet": 1e-5,     # length-aware masked LSTMs + norms (round 5)
    "MossFormer": 3.7e-2,    # linear-attention kv residual over padding
    "AFRCNN": 0.12,
    "SuDORMRF": 0.12,
    "DPTNet": 0.13,
    "BSRNN": 0.18,
    "TDANet": 0.27,
    "TFGridNet": 0.38,
}

PAD_SAFE_THRESHOLD = 5e-2


def pad_safe(model) -> bool:
    """True if bucket-padded dispatch of this arch is numerically safe.

    Unknown archs are treated as unsafe (exact-length routing is always
    correct, just costs one compile per distinct length)."""
    name = type(model).__name__
    return PADDED_BUCKET_DEVIATION.get(name, 1.0) <= PAD_SAFE_THRESHOLD
