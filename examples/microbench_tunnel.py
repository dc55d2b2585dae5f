#!/usr/bin/env python
"""Microbenchmark: tunnel RTT, transfer bandwidth, and device-resident
compute time for each pipeline stage at production geometry. Separates
"what the TPU takes" from "what the host link costs" to guide fusion.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def t_best(fn, n=5):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best * 1000


def main():
    import jax
    import jax.numpy as jnp

    import bench

    bench.enable_compile_cache()
    print(f"devices: {jax.devices()}")

    # --- RTT: trivial dispatch + sync
    one = jax.device_put(jnp.ones(8))
    f = jax.jit(lambda x: x + 1)
    f(one).block_until_ready()
    print(f"RTT (tiny dispatch+sync):      {t_best(lambda: f(one).block_until_ready()):8.1f} ms")

    # --- transfers
    a32 = np.random.randn(138560).astype(np.float32)  # 8.66 s @16k f32, 554 KB
    a16 = (a32 * 1000).astype(np.int16)
    big = np.random.randn(138560 * 8).astype(np.float32)  # 4.4 MB
    print(f"upload 554KB f32 + sync:       {t_best(lambda: jax.device_put(a32).block_until_ready()):8.1f} ms")
    print(f"upload 277KB i16 + sync:       {t_best(lambda: jax.device_put(a16).block_until_ready()):8.1f} ms")
    print(f"upload 4.4MB f32 + sync:       {t_best(lambda: jax.device_put(big).block_until_ready()):8.1f} ms")
    dev32 = jax.device_put(a32)
    devbig = jax.device_put(big)
    jax.block_until_ready([dev32, devbig])
    print(f"download 554KB:                {t_best(lambda: np.asarray(dev32)):8.1f} ms")
    print(f"download 4.4MB:                {t_best(lambda: np.asarray(devbig)):8.1f} ms")

    # --- per-stage compute, device-resident
    from targetdiarization_tpu.models import features
    from targetdiarization_tpu.models.asr import LFR_N, Paraformer
    from targetdiarization_tpu.models.denoise import (
        TDFUNet, mdx_chunk_size, mdx_istft, mdx_stft,
    )
    from targetdiarization_tpu.models.diarization import SegmentationNet
    from targetdiarization_tpu.models.separation import MossFormer2
    from targetdiarization_tpu.models.speaker import ERes2NetV2
    from targetdiarization_tpu.models.tokenizer import CharTokenizer
    from targetdiarization_tpu.models.vad import FsmnVADNet
    from targetdiarization_tpu.ops.loudness import integrated_loudness
    from targetdiarization_tpu.ops.resample import resample
    from targetdiarization_tpu.runtime.params import fast_init
    from targetdiarization_tpu.runtime.precision import cast_params

    # resample 16k->44.1k mono 8.66 s
    x16 = jax.device_put(jnp.asarray(a32))
    r = jax.jit(lambda x: resample(x, 44100, 16000))
    r(x16).block_until_ready()
    print(f"resample 16k->44.1k (8.66s):   {t_best(lambda: r(x16).block_until_ready()):8.1f} ms")

    # loudness
    il = jax.jit(lambda x: integrated_loudness(x, 16000))
    il(x16).block_until_ready()
    print(f"integrated_loudness (8.66s):   {t_best(lambda: il(x16).block_until_ready()):8.1f} ms")

    # MDX chain: one 15 s chunk window batch W=1
    unet = TDFUNet()
    up = cast_params(fast_init(unet, jnp.zeros((1, 4, 3072, 256))), jnp.bfloat16)
    wav441 = jax.device_put(jnp.zeros((1, 2, mdx_chunk_size(1024)), jnp.float32))

    @jax.jit
    def mdx_chain(p, w):
        spec = mdx_stft(w, 1024)
        pred = unet.apply(p, spec.astype(jnp.bfloat16)).astype(jnp.float32)
        return mdx_istft(pred, 1024)

    mdx_chain(up, wav441).block_until_ready()
    print(f"MDX stft+unet+istft (1 chunk): {t_best(lambda: mdx_chain(up, wav441).block_until_ready()):8.1f} ms")

    # VAD forward 16 s bucket
    vad = FsmnVADNet()
    vp = cast_params(fast_init(vad, jnp.zeros((1, 100, 80)), jnp.array([100])), jnp.bfloat16)

    @jax.jit
    def vad_fwd(p, a, n):
        f = features.fbank(a)
        return jax.nn.softmax(vad.apply(p, f.astype(jnp.bfloat16), n), axis=-1)

    a16s = jax.device_put(jnp.zeros((1, 16 * 16000), jnp.float32))
    n16 = jnp.array([1600])
    vad_fwd(vp, a16s, n16).block_until_ready()
    print(f"VAD fbank+fwd (16s bucket):    {t_best(lambda: vad_fwd(vp, a16s, n16).block_until_ready()):8.1f} ms")

    # segmentation forward 16 s bucket
    seg = SegmentationNet()
    sp = cast_params(fast_init(seg, jnp.zeros((1, 100, 80)), jnp.array([100])), jnp.bfloat16)

    @jax.jit
    def seg_fwd(p, a, n):
        f = features.fbank(a)
        return seg.apply(p, f.astype(jnp.bfloat16), n)

    seg_fwd(sp, a16s, n16).block_until_ready()
    print(f"SEG fbank+fwd (16s bucket):    {t_best(lambda: seg_fwd(sp, a16s, n16).block_until_ready()):8.1f} ms")

    # speaker embed (B=8, 8s bucket)
    spk = ERes2NetV2(channels=24, blocks=(2, 2, 2, 2))
    kp = cast_params(fast_init(spk, jnp.zeros((1, 100, 80)), jnp.array([100])), jnp.bfloat16)

    @jax.jit
    def spk_fwd(p, a, n):
        f = features.fbank(a)
        return spk.apply(p, f.astype(jnp.bfloat16), n, train=False)

    a8 = jax.device_put(jnp.zeros((8, 8 * 16000), jnp.float32))
    n8 = jnp.full((8,), 800)
    spk_fwd(kp, a8, n8).block_until_ready()
    print(f"SPK embed fbank+fwd (B=8,8s):  {t_best(lambda: spk_fwd(kp, a8, n8).block_until_ready()):8.1f} ms")

    # Paraformer forward B=2, 16 s bucket
    tok = CharTokenizer()
    asr = Paraformer(vocab_size=len(tok), enc_layers=50, dec_layers=16)
    ap = cast_params(fast_init(asr, jnp.zeros((1, 16, 560)), jnp.ones((1, 16))), jnp.bfloat16)

    @jax.jit
    def asr_fwd(p, a, n):
        f = features.fbank(a)
        f = features.lfr(f, 7, 6)
        t = f.shape[1]
        mask = (jnp.arange(t)[None, :] < n[:, None]).astype(jnp.float32)
        out = asr.apply(p, f.astype(jnp.bfloat16), mask.astype(jnp.bfloat16))
        return (jnp.argmax(out["logits"], axis=-1), out["n_tokens"], out["fire_frames"])

    a2 = jax.device_put(jnp.zeros((2, 16 * 16000), jnp.float32))
    nf = jnp.full((2,), 16 * 100 // LFR_N)
    jax.block_until_ready(asr_fwd(ap, a2, nf))
    print(f"ASR fbank+fwd+argmax (B=2,16s):{t_best(lambda: jax.block_until_ready(asr_fwd(ap, a2, nf))):8.1f} ms")

    # MossFormer2 separation (1x 8s window @16k)
    sep = MossFormer2()
    mp = cast_params(
        fast_init(sep, jnp.zeros((1, sep.kernel_size * sep.group_size))),
        jnp.bfloat16)

    @jax.jit
    def sep_fwd(p, a):
        return sep.apply(p, a, deterministic=True)

    aw = jax.device_put(jnp.zeros((1, 8 * 16000), jnp.float32))
    sep_fwd(mp, aw).block_until_ready()
    print(f"SEP MossFormer2 (1x8s):        {t_best(lambda: sep_fwd(mp, aw).block_until_ready()):8.1f} ms")


if __name__ == "__main__":
    main()
