"""Apollo band-split audio restoration @44.1 kHz, TPU-native.

Re-implementation of the reference restorer (look2hear/models/apollo.py:207)
with a TPU-first data layout: the reference loops Python lists over 80
sub-bands for the input bottleneck and output heads (apollo.py:231-248);
here the 79 uniform 5-bin bands are one stacked tensor with per-band
parameter banks applied in a single einsum (one MXU call instead of 79
tiny convs), and only the ragged tail band (47 bins, SURVEY.md §7.4.6)
has its own projection.

Pipeline per window: STFT (win 20 ms, hop 10 ms) → per-band power
normalization + [real, imag, log power] features → feature_dim bottleneck
→ `layer`× BSNet (Roformer attention ACROSS bands + inverted conv block
along time) → per-band GLU heads → complex spectrum → iSTFT.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stft import stft, istft
from ..ops.dwconv import DepthwiseConv1d
from ..runtime.registry import register_model

EPS = 1.1920928955078125e-07  # float32 eps, matches torch.finfo use


class RMSNorm(nn.Module):
    dim: int
    axis: int = -1

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        ms = jnp.mean(jnp.square(x), axis=self.axis, keepdims=True)
        shape = [1] * x.ndim
        shape[self.axis] = self.dim
        return x * jax.lax.rsqrt(ms + 1e-5) * w.reshape(shape)


class BandRoformer(nn.Module):
    """Multi-head attention across the band axis with RoPE (apollo.py:49)."""

    dim: int
    heads: int = 8

    @nn.compact
    def __call__(self, x):
        # x: (B, K, T, N) — attention over K (bands) for every (B, T)
        b, k, t, n = x.shape
        hd = self.dim // self.heads
        h = RMSNorm(self.dim, name="in_norm")(x)
        qkv = nn.Dense(3 * self.dim, use_bias=False, name="qkv")(h)
        qkv = qkv.reshape(b, k, t, 3, self.heads, hd)
        q, kk, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]

        # rotary over band index (interleaved-pair convention, apollo.py:95-118)
        freq = 1.0 / (10000.0 ** (jnp.arange(0, hd, 2) / hd))
        ang = jnp.arange(k)[:, None] * freq[None, :]  # (K, hd/2)
        cos = jnp.repeat(jnp.cos(ang), 2, axis=-1).reshape(k, 1, 1, hd)
        sin = jnp.repeat(jnp.sin(ang), 2, axis=-1).reshape(k, 1, 1, hd)

        def rope(z):
            z2 = z.reshape(*z.shape[:-1], hd // 2, 2)
            z_neg = jnp.stack([-z2[..., 1], z2[..., 0]], axis=-1).reshape(z.shape)
            return z * cos[None] + z_neg * sin[None]

        q, kk = rope(q), rope(kk)
        # attention over axis 1 (bands): fold T into batch
        qt = q.transpose(0, 2, 3, 1, 4)  # (B, T, H, K, hd)
        kt = kk.transpose(0, 2, 3, 1, 4)
        vt = v.transpose(0, 2, 3, 1, 4)
        att = jnp.einsum("bthkd,bthjd->bthkj", qt, kt) / np.sqrt(hd)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bthkj,bthjd->bthkd", att, vt)
        out = out.transpose(0, 3, 1, 2, 4).reshape(b, k, t, self.dim)
        x = x + nn.Dense(self.dim, use_bias=False, name="out")(out)

        # gated MLP (apollo.py:74-79, 146-147)
        h = RMSNorm(self.dim, name="mlp_norm")(x)
        h = nn.silu(nn.Dense(self.dim * 8, use_bias=False, name="mlp_in")(h))
        gate, z = jnp.split(h, 2, axis=-1)
        x = x + nn.Dense(self.dim, use_bias=False, name="mlp_out")(nn.silu(gate) * z)
        return x


class ConvActNorm(nn.Module):
    """Residual depthwise-conv inverted bottleneck along time (apollo.py:149)."""

    dim: int
    kernel: int = 7

    @nn.compact
    def __call__(self, x):
        # x: (..., T, N)
        h = DepthwiseConv1d(
            features=self.dim, kernel_size=self.kernel, use_bias=True,
            name="dw",
        )(x)
        h = RMSNorm(self.dim, name="norm")(h)
        h = nn.Dense(self.dim * 4, name="up")(h)
        h = nn.silu(h)
        h = nn.Dense(self.dim, name="down")(h)
        return x + h


class BSNet(nn.Module):
    """One band-split layer: band attention + time ICB (apollo.py:183)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        # x: (B, K, T, N)
        x = BandRoformer(self.dim, name="band_net")(x)
        b, k, t, n = x.shape
        h = x.reshape(b * k, t, n)
        for i in range(3):
            h = ConvActNorm(self.dim, name=f"icb_{i}")(h)
        return h.reshape(b, k, t, n)


@register_model(name="Apollo")
class Apollo(nn.Module):
    """Band-split restoration; defaults match the reference load site
    (sr=44100, win=20 ms, feature_dim=256, layer=6 — AudioProcessor.py:277-281)."""

    sr: int = 44100
    win_ms: int = 20
    feature_dim: int = 256
    layer: int = 6

    @property
    def win(self) -> int:
        return int(self.sr * self.win_ms // 1000)

    @property
    def stride(self) -> int:
        return self.win // 2

    @property
    def enc_dim(self) -> int:
        return self.win // 2 + 1

    def _bands(self):
        bw = int(self.win / 160)
        n_uniform = 79
        tail = self.enc_dim - bw * n_uniform
        return bw, n_uniform, tail

    @nn.compact
    def __call__(self, wav, return_spec: bool = False):
        # wav: (B, T) mono or (B, C, T); return_spec=True yields the
        # estimated complex spectrum instead of the waveform (training
        # uses spectrum losses so gradients never differentiate through
        # the iSTFT — rfft/irfft backward is unimplemented on some TPU
        # runtimes)
        squeeze_ch = wav.ndim == 2
        if squeeze_ch:
            wav = wav[:, None, :]
        b, ch, nsample = wav.shape
        bw, n_uni, tail = self._bands()
        nband = n_uni + 1
        d = self.feature_dim

        spec = stft(wav.reshape(b * ch, nsample), self.win, self.stride)  # (BC, F, T)
        t = spec.shape[-1]

        def band_feats(sub):  # sub: (BC, K, bw_k, T) complex
            power = jnp.sqrt(
                jnp.sum(jnp.square(jnp.abs(sub)), axis=2, keepdims=True) + EPS
            )  # (BC, K, 1, T)
            norm = sub / power
            return jnp.concatenate(
                [norm.real, norm.imag, jnp.log(power)], axis=2
            )  # (BC, K, 2bw+1, T)

        uni = spec[:, : bw * n_uni].reshape(b * ch, n_uni, bw, t)
        uni_f = band_feats(uni)  # (BC, 79, 2bw+1, T)
        tail_f = band_feats(spec[:, bw * n_uni :][:, None])  # (BC, 1, 2tail+1, T)

        # per-band RMSNorm + bottleneck: stacked params, one einsum
        uw = self.param("uni_norm_w", nn.initializers.ones, (n_uni, 2 * bw + 1))
        uni_n = uni_f * jax.lax.rsqrt(
            jnp.mean(jnp.square(uni_f), axis=2, keepdims=True) + 1e-5
        ) * uw[None, :, :, None]
        ukern = self.param(
            "uni_bn_w", nn.initializers.lecun_normal(), (n_uni, 2 * bw + 1, d)
        )
        ubias = self.param("uni_bn_b", nn.initializers.zeros, (n_uni, d))
        uni_emb = jnp.einsum("bkct,kcd->bkdt", uni_n, ukern) + ubias[None, :, :, None]

        tw = self.param("tail_norm_w", nn.initializers.ones, (2 * tail + 1,))
        tail_n = tail_f * jax.lax.rsqrt(
            jnp.mean(jnp.square(tail_f), axis=2, keepdims=True) + 1e-5
        ) * tw[None, None, :, None]
        tkern = self.param(
            "tail_bn_w", nn.initializers.lecun_normal(), (2 * tail + 1, d)
        )
        tbias = self.param("tail_bn_b", nn.initializers.zeros, (d,))
        tail_emb = jnp.einsum("bkct,cd->bkdt", tail_n, tkern) + tbias[None, None, :, None]

        feat = jnp.concatenate([uni_emb, tail_emb], axis=1)  # (BC, nband, D, T)
        feat = feat.transpose(0, 1, 3, 2)  # (BC, nband, T, D)

        for i in range(self.layer):
            feat = BSNet(d, name=f"bsnet_{i}")(feat)

        # output heads: per-band RMSNorm + GLU projection to (real, imag)
        feat = RMSNormBanked(nband, d, name="out_norm")(feat)
        ow = self.param("uni_out_w", nn.initializers.lecun_normal(), (n_uni, d, bw * 4))
        ob = self.param("uni_out_b", nn.initializers.zeros, (n_uni, bw * 4))
        uni_out = jnp.einsum("bktd,kdc->bktc", feat[:, :n_uni], ow) + ob[None, :, None, :]
        val, gate = jnp.split(uni_out, 2, axis=-1)
        uni_ri = val * jax.nn.sigmoid(gate)  # (BC, 79, T, 2bw)
        uni_real = uni_ri[..., :bw].transpose(0, 1, 3, 2).reshape(
            b * ch, n_uni * bw, t)
        uni_imag = uni_ri[..., bw:].transpose(0, 1, 3, 2).reshape(
            b * ch, n_uni * bw, t)

        tow = self.param("tail_out_w", nn.initializers.lecun_normal(), (d, tail * 4))
        tob = self.param("tail_out_b", nn.initializers.zeros, (tail * 4,))
        tail_out = jnp.einsum("btd,dc->btc", feat[:, -1], tow) + tob[None, None, :]
        tval, tgate = jnp.split(tail_out, 2, axis=-1)
        tail_ri = tval * jax.nn.sigmoid(tgate)
        tail_real = tail_ri[..., :tail].transpose(0, 2, 1)
        tail_imag = tail_ri[..., tail:].transpose(0, 2, 1)

        est_real = jnp.concatenate([uni_real, tail_real], axis=1)  # (BC, F, T)
        est_imag = jnp.concatenate([uni_imag, tail_imag], axis=1)
        if return_spec:
            # real/imag planes as REAL tensors: training losses never
            # build complex arrays (complex backward is unimplemented on
            # some TPU runtimes)
            return jnp.stack([est_real, est_imag], axis=-1)
        est = est_real + 1j * est_imag
        out = istft(est, self.win, self.stride, length=nsample)
        out = out.reshape(b, ch, -1)
        return out[:, 0] if squeeze_ch else out


class RMSNormBanked(nn.Module):
    """Per-band RMSNorm with a (nband, dim) weight bank."""

    nband: int
    dim: int

    @nn.compact
    def __call__(self, x):
        # x: (B, K, T, D)
        w = self.param("weight", nn.initializers.ones, (self.nband, self.dim))
        ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        return x * jax.lax.rsqrt(ms + 1e-5) * w[None, :, None, :]


class RestorationEngine:
    """Windowed 44.1 kHz restoration with overlap-add stitching
    (reference restore_audio AudioProcessor.py:959-982 + the generic
    wav_chunk_inference overlap-add, separator.py:72-131)."""

    def __init__(self, params=None, model: Apollo | None = None, seed: int = 0,
                 window_s: float = 6.0, hop_s: float = 3.0,
                 compute_dtype: str | None = None):
        self.model = model or Apollo()
        self.window = int(window_s * self.model.sr)
        self.hop = int(hop_s * self.model.sr)
        if params is None:
            # jitted init: eager complex dispatch is UNIMPLEMENTED
            # on the axon TPU backend
            params = jax.jit(lambda: self.model.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, self.model.win * 4))))()
        self.params = params
        from ..runtime.precision import resolve_compute_dtype, cast_params, f32

        self.compute_dtype = resolve_compute_dtype(compute_dtype)
        self._params_c = cast_params(params, self.compute_dtype)
        # STFT/iSTFT inside Apollo need fp32 signal; only params are bf16
        self._apply = jax.jit(lambda p, w: f32(self.model.apply(p, w)))

    @classmethod
    def from_pretrained(cls, path: str) -> "RestorationEngine":
        from ..runtime.registry import from_pretrained

        model, params = from_pretrained(path)
        return cls(params=params, model=model)

    def restore(self, audio: np.ndarray, sr: int = 16000) -> np.ndarray:
        from ..ops.resample import resample_poly_np
        from ..ops.chunk import chunk_signal, merge_chunks

        audio = np.asarray(audio, np.float32)
        t_orig = len(audio)
        if t_orig == 0:
            return audio
        work = (
            resample_poly_np(audio, self.model.sr, sr)
            if sr != self.model.sr
            else audio
        )
        window = self.window
        if len(work) <= window:
            # short clips run a bucketed program instead of the full
            # 6 s overlap-add window (VERDICT r2 ask 4; the STFT frame
            # grid keeps buckets at multiples of the model stride)
            from ..runtime.buckets import BucketLadder

            st = self.model.stride
            ladder = BucketLadder(tuple(
                b for b in (st * 100, st * 200, st * 400, window)
                if b <= window))
            window = ladder.bucket(max(len(work), self.model.win))
        # single-chunk bucket → hop = window (no overlap-add to do)
        hop = self.hop if window == self.window else window
        chunks, n = chunk_signal(jnp.asarray(work), window, hop)
        est = self._apply(self._params_c, chunks)
        out = np.asarray(merge_chunks(est, n, hop, window_fn="tri"))
        if sr != self.model.sr:
            out = resample_poly_np(out, sr, self.model.sr)
        if len(out) >= t_orig:
            return out[:t_orig]
        return np.pad(out, (0, t_orig - len(out)))
