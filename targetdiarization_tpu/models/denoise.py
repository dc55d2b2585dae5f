"""MDX vocal denoising: TDF U-Net on packed stereo STFT + spectral gate.

TPU-native replacement for the reference's two denoise paths
(AudioProcessor.denoise_vocal, AudioProcessor.py:601-710):

- ConvTDFNet STFT packing (AudioProcessor.py:65-120): stereo 44.1 kHz,
  n_fft=6144, hop 1024 (quality preset 2), frames 256; (real, imag) ×
  (L, R) packed as 4 channels, cropped to dim_f=3072 bins. Implemented
  as jitted jnp (`mdx_stft`/`mdx_istft`).
- the UVR-MDX-NET "Inst" U-Net (run via onnxruntime there): here
  `TDFUNet`, a time-frequency-conv U-Net with TDF (dense-across-freq
  bottleneck) blocks — the KUIELab MDX-Net architecture family — in
  flax. "Inst" semantics preserved: the net predicts the instrumental
  and vocals = mix − prediction (AudioProcessor.py:639-641).
- `fast_mode` spectral-gating fallback (noisereduce there): stationary
  spectral gate in pure jnp.

Chunking mirrors the reference: 15 s chunks, 1 s margins, all windows
batched into one forward (AudioProcessor.py:602-630).
"""

from __future__ import annotations

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stft import stft, istft
from ..runtime.registry import register_model

MDX_SR = 44100
N_FFT = 6144
DIM_F = 3072
DIM_T = 256


def mdx_chunk_size(hop: int) -> int:
    return hop * (DIM_T - 1)


@partial(jax.jit, static_argnames=("hop",))
def mdx_stft(x: jnp.ndarray, hop: int = 1024) -> jnp.ndarray:
    """(B, 2, chunk) stereo waves → (B, 4, DIM_F, DIM_T) packed spec."""
    b = x.shape[0]
    spec = stft(x.reshape(b * 2, -1), N_FFT, hop)  # (2B, n_bins, T)
    spec = spec[..., :DIM_T]
    packed = jnp.stack([spec.real, spec.imag], axis=1)  # (2B, 2, F, T)
    packed = packed.reshape(b, 4, N_FFT // 2 + 1, -1)
    return packed[:, :, :DIM_F]


@partial(jax.jit, static_argnames=("hop",))
def mdx_istft(packed: jnp.ndarray, hop: int = 1024) -> jnp.ndarray:
    """(B, 4, DIM_F, DIM_T) → (B, 2, chunk) stereo waves."""
    b = packed.shape[0]
    n_bins = N_FFT // 2 + 1
    full = jnp.pad(packed, ((0, 0), (0, 0), (0, n_bins - DIM_F), (0, 0)))
    full = full.reshape(b * 2, 2, n_bins, -1)
    spec = full[:, 0] + 1j * full[:, 1]
    wav = istft(spec, N_FFT, hop, length=mdx_chunk_size(hop))
    return wav.reshape(b, 2, -1)


class TFCTDF(nn.Module):
    """Time-frequency conv block + dense-across-frequency bottleneck."""

    channels: int
    freq: int
    bn_factor: int = 16

    @nn.compact
    def __call__(self, x):
        # x: (B, F, T, C)
        h = x
        for i in range(2):
            h = nn.GroupNorm(num_groups=1, name=f"gn{i}")(h)
            h = nn.gelu(h)
            h = nn.Conv(self.channels, (3, 3), padding="SAME", name=f"conv{i}")(h)
        # TDF: bottleneck dense layer across the frequency axis
        f = self.freq
        t = nn.GroupNorm(num_groups=1, name="tdf_gn")(h)
        t = nn.gelu(t)
        t = jnp.swapaxes(t, 1, 3)  # (B, C, T, F)
        t = nn.Dense(max(f // self.bn_factor, 4), name="tdf_down")(t)
        t = nn.gelu(t)
        t = nn.Dense(f, name="tdf_up")(t)
        t = jnp.swapaxes(t, 1, 3)
        return h + t + (x if x.shape[-1] == self.channels else 0)


@register_model(name="TDFUNet")
class TDFUNet(nn.Module):
    """U-Net over packed MDX spectrograms, stride-2 down/up in (F, T)."""

    channels: int = 32
    depth: int = 4
    growth: int = 16

    @nn.compact
    def __call__(self, x):
        # x: (B, 4, F, T) packed → NHWC (B, F, T, 4)
        h = jnp.transpose(x, (0, 2, 3, 1))
        f = h.shape[1]
        h = nn.Conv(self.channels, (1, 1), name="in_conv")(h)
        skips = []
        c = self.channels
        for i in range(self.depth):
            h = TFCTDF(c, freq=f, name=f"enc_{i}")(h)
            skips.append(h)
            c += self.growth
            f //= 2
            h = nn.Conv(c, (2, 2), strides=(2, 2), name=f"down_{i}")(h)
        h = TFCTDF(c, freq=f, name="bottleneck")(h)
        for i in reversed(range(self.depth)):
            c -= self.growth
            f *= 2
            h = nn.ConvTranspose(c, (2, 2), strides=(2, 2), name=f"up_{i}")(h)
            h = h + skips[i]
            h = TFCTDF(c, freq=f, name=f"dec_{i}")(h)
        h = nn.Conv(4, (1, 1), name="out_conv")(h)
        return jnp.transpose(h, (0, 3, 1, 2))  # (B, 4, F, T)


# ---------------- spectral gate (noisereduce fast path) ----------------


@partial(jax.jit, static_argnames=("n_fft", "hop", "n_std"))
def spectral_gate(
    audio: jnp.ndarray, n_fft: int = 1024, hop: int = 256, n_std: float = 1.5
) -> jnp.ndarray:
    """Stationary spectral gating: threshold per-bin log-magnitude at
    mean + n_std·std of the clip's own statistics, soft mask, resynth."""
    n = audio.shape[-1]
    spec = stft(audio, n_fft, hop)
    mag = jnp.abs(spec)
    log_mag = jnp.log(mag + 1e-8)
    mean = jnp.mean(log_mag, axis=-1, keepdims=True)
    std = jnp.std(log_mag, axis=-1, keepdims=True)
    thresh = mean + n_std * std
    # smooth sigmoid mask with 6 dB softness
    mask = jax.nn.sigmoid((log_mag - thresh) / 0.5)
    # temporal smoothing of the mask (3-tap)
    mask = (
        jnp.pad(mask, ((0, 0), (1, 1)), mode="edge")[:, :-2]
        + mask
        + jnp.pad(mask, ((0, 0), (1, 1)), mode="edge")[:, 2:]
    ) / 3.0
    return istft(spec * mask, n_fft, hop, length=n)


def denoise_chain_16k(eng: "DenoiseEngine", dn_params, audio: jnp.ndarray,
                      bucket: int) -> jnp.ndarray:
    """The full denoise_vocal chain in-graph for a (bucket,)-sample 16 kHz
    buffer: 16k→44.1k MXU resample, stereo duplicate, MDX STFT chunking,
    U-Net forward, iSTFT, margin trim, inst-model subtraction, downmix,
    44.1k→16k (reference AudioProcessor.py:601-710). Used by the fused
    frontend's preprocess graph and by training-time preprocess
    augmentation (recipes.bootstrap_asr aug_frac)."""
    from ..ops.resample import resample
    from ..ops.stft import frame_signal
    from ..runtime.precision import cast_inputs, f32

    hop = eng.hop
    n44 = -(-bucket * 441 // 160)
    x44 = resample(audio, 44100, 16000)  # (n44,)
    stereo = jnp.stack([x44, x44])  # (2, n44)
    trim = N_FFT // 2
    cs = mdx_chunk_size(hop)
    gen = cs - 2 * trim
    n_chunks = -(-n44 // gen)
    padded = jnp.pad(stereo, ((0, 0), (trim, n_chunks * gen - n44 + trim)))
    waves = frame_signal(padded, cs, gen)  # (2, n_chunks, cs)
    waves = jnp.swapaxes(waves, 0, 1)  # (W, 2, cs)
    spec = mdx_stft(waves, hop)
    (spec_c,) = cast_inputs(eng.compute_dtype, spec)
    pred = f32(eng.model.apply(dn_params, spec_c))
    wav = mdx_istft(pred, hop)  # (W, 2, cs)
    inner = wav[:, :, trim:-trim]  # (W, 2, gen)
    out44 = jnp.swapaxes(inner, 0, 1).reshape(2, -1)[:, :n44]
    vocals = jnp.clip(stereo - out44, -1.0, 1.0) if eng.is_inst_model \
        else jnp.clip(out44, -1.0, 1.0)
    mono = jnp.mean(vocals, axis=0)
    out = resample(mono, 16000, 44100)
    return out[:bucket]


# ---------------- engine ----------------


class DenoiseEngine:
    """MDX-style vocal isolation with reference-compatible chunking."""

    def __init__(self, params=None, model: TDFUNet | None = None, seed: int = 0,
                 hop: int = 1024, is_inst_model: bool = True,
                 compute_dtype: str | None = None):
        self.model = model or TDFUNet()
        self.hop = hop
        self.is_inst_model = is_inst_model  # vocals = mix − prediction
        if params is None:
            params = self.model.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, 4, DIM_F, DIM_T))
            )
        self.params = params
        from ..runtime.precision import resolve_compute_dtype, cast_params, cast_inputs, f32

        self.compute_dtype = resolve_compute_dtype(compute_dtype)
        self._params_c = cast_params(params, self.compute_dtype)

        def _fwd(p, spec):
            (spec_c,) = cast_inputs(self.compute_dtype, spec)
            return f32(self.model.apply(p, spec_c))

        self._apply = jax.jit(_fwd)

    @classmethod
    def from_pretrained(cls, path: str, hop: int = 1024) -> "DenoiseEngine":
        from ..runtime.registry import from_pretrained

        model, params = from_pretrained(path)
        return cls(params=params, model=model, hop=hop)

    def _process_chunk(self, chunk: np.ndarray) -> np.ndarray:
        """chunk: (T, 2) stereo @44.1 kHz → denoised (T, 2)."""
        mix = chunk.T  # (2, T)
        n_sample = mix.shape[1]
        trim = N_FFT // 2
        chunk_size = mdx_chunk_size(self.hop)
        gen_size = chunk_size - 2 * trim
        pad = (gen_size - (n_sample % gen_size)) % gen_size
        padded = np.concatenate(
            [np.zeros((2, trim), np.float32), mix,
             np.zeros((2, pad), np.float32), np.zeros((2, trim), np.float32)],
            axis=1,
        )
        waves = []
        cursor = 0
        while cursor < n_sample + pad:
            waves.append(padded[:, cursor: cursor + chunk_size])
            cursor += gen_size
        batch = jnp.asarray(np.stack(waves))  # (W, 2, chunk)
        spec = mdx_stft(batch, self.hop)
        pred = self._apply(self._params_c, spec)
        wav = np.asarray(mdx_istft(pred, self.hop))  # (W, 2, chunk)
        out = wav[:, :, trim:-trim].transpose(1, 0, 2).reshape(2, -1)[:, : n_sample]
        out = out.T
        if self.is_inst_model:
            return np.clip(chunk - out, -1.0, 1.0)
        return np.clip(out, -1.0, 1.0)

    def denoise_vocal(self, audio: np.ndarray, sr: int = 16000,
                      fast_mode: bool = False) -> np.ndarray:
        from ..ops.resample import resample_poly_np

        audio = np.asarray(audio, np.float32)
        if audio.size == 0:
            return audio
        if fast_mode:
            return np.asarray(spectral_gate(jnp.asarray(audio)))
        work = resample_poly_np(audio, MDX_SR, sr) if sr != MDX_SR else audio
        is_mono = work.ndim == 1
        stereo = np.stack([work, work], axis=1) if is_mono else work
        chunk_sec, margin_sec = 15.0, 1.0
        chunk = int(chunk_sec * MDX_SR)
        margin = int(margin_sec * MDX_SR)
        total = stereo.shape[0]
        if total <= chunk:
            out = self._process_chunk(stereo)
        else:
            pieces = []
            cursor = 0
            idx = 0
            bounds = []
            while cursor < total:
                start = max(0, cursor - (0 if idx == 0 else margin))
                is_last = cursor + chunk >= total
                end = total if is_last else min(cursor + chunk + margin, total)
                bounds.append((start, end, idx == 0, is_last))
                cursor += chunk
                idx += 1
                if is_last:
                    break
            for start, end, first, last in bounds:
                seg = self._process_chunk(stereo[start:end])
                s_trim = 0 if first else min(margin, len(seg) // 2)
                e_trim = None if last else -min(margin, len(seg) // 2)
                pieces.append(seg[s_trim:e_trim])
            out = np.concatenate(pieces, axis=0)
        mono = out.mean(axis=1) if is_mono else out
        if sr != MDX_SR:
            mono = resample_poly_np(mono.T if mono.ndim == 2 else mono, sr, MDX_SR)
            mono = mono.T if mono.ndim == 2 else mono
        target_len = len(audio)
        if len(mono) >= target_len:
            return mono[:target_len]
        return np.pad(mono, [(0, target_len - len(mono))] + [(0, 0)] * (mono.ndim - 1))
