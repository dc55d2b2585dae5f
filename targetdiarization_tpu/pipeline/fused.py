"""Fused device programs for the offline pipeline's front half.

The round-1 pipeline ran one jitted program per engine per stage —
preprocess, denoise, VAD, segmentation, enrollment, per-speaker
embedding — each paying a host-link round trip (~30 ms through the TPU
tunnel) and np round-tripping the audio between stages. This module
collapses whole pipeline PHASES into single programs (VERDICT.md
round-1 item 2: "fewer, bigger jitted programs", reference call stack
TargetDiarization.py:98-163):

`FusedFrontend.analyze` — ONE dispatch per inference:
    int16 audio upload → f32 → BS.1770 loudness normalize → MDX denoise
    (full in-graph chain incl. the 16k↔44.1k MXU resample) → loudness →
    shared fbank → FSMN-VAD probabilities + segmentation activations +
    sliding-window speaker embeddings → int16 audio download.
The sliding embeddings feed BOTH the cluster diarizer (CAM++ slot) and
target-speaker scoring on host, replacing the per-segment embedding
dispatches of `target_embedding_to_target_spk`
(reference TargetDiarization.py:581-599).

`FusedFrontend.enroll` — ONE dispatch per distinct target file:
    preprocess chain → VAD probs → trim to [first, last] speech frame
    (jnp.roll + prefix length, exactly the reference's VAD trim
    TargetDiarization.py:118-121) → masked-CMN embedding.

`StreamChunkAnalyzer` — ONE dispatch per streaming chunk decision
    (buffer VAD + chunk VAD + prev/chunk embeddings + similarity for
    the R1-R5 flush cascade).

`FusedSeparation` — ONE dispatch per overlap batch (MossFormer2 →
    optional in-graph Apollo restore → VAD + embeddings of both
    streams).

`FusedASR` — ONE dispatch for all speakers' combined-track ASR +
    punctuation, on the analyze program's device-resident audio buffer
    (tracks are interval masks — nothing re-uploads).

All programs are bucketed (static shapes per rung) and transfer audio as
int16 — half the bytes of f32 through a ~35 MB/s tunnel link. Offline
infer = 2 dispatches total; measured 82.7× real-time on one v5e through
a ~28 ms-RTT tunnel (19× in round 1).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models import features
from ..runtime.buckets import BucketLadder, pad_to
from ..runtime.trace import trace

# denser than the per-engine ladders: the fused program runs the MDX
# U-Net over the whole bucket, so padding waste is pure compute
_LADDER = BucketLadder(tuple(int(s * 16000) for s in (1, 2, 4, 8, 10, 16, 22, 30)))

_WIN_S = 1.5  # sliding embedding window (DiarizeConfig.window)
_HOP_S = 0.75
_WIN_F = int(_WIN_S * 100)  # fbank frames per window
_HOP_F = int(_HOP_S * 100)
_MAX_EMBED_FRAMES = 2998  # ≈30 s — reference truncates SV input (TargetASR.py:222)


def _masked_loudness_normalize(audio, sr: int, n_valid, target_lufs: float = -23.0):
    """BS.1770 normalize of the first `n_valid` samples of a padded
    buffer: gating blocks that straddle or lie past n_valid are excluded
    so padding cannot bias the measurement."""
    from ..ops.loudness import k_weight
    from ..ops.stft import frame_signal

    y = k_weight(audio, sr)
    t_g = int(0.4 * sr)
    hop = t_g // 4
    blocks = frame_signal(y, t_g, hop)  # (n_blocks, t_g)
    n_blocks = blocks.shape[0]
    ends = jnp.arange(n_blocks) * hop + t_g
    bvalid = ends <= n_valid
    z_blocks = jnp.mean(jnp.square(blocks), axis=-1)
    l_blocks = -0.691 + 10.0 * jnp.log10(jnp.maximum(z_blocks, 1e-30))
    abs_mask = (l_blocks > -70.0) & bvalid
    z_abs = jnp.sum(z_blocks * abs_mask) / jnp.maximum(jnp.sum(abs_mask), 1.0)
    gamma_r = -0.691 + 10.0 * jnp.log10(jnp.maximum(z_abs, 1e-30)) - 10.0
    rel_mask = abs_mask & (l_blocks > gamma_r)
    z_rel = jnp.sum(z_blocks * rel_mask) / jnp.maximum(jnp.sum(rel_mask), 1.0)
    loud = -0.691 + 10.0 * jnp.log10(jnp.maximum(z_rel, 1e-30))
    gain = jnp.power(10.0, (target_lufs - loud) / 20.0)
    # too-short / silent input (no gated blocks): leave level unchanged,
    # mirroring audio_loudness_control's <0.4 s early-out
    gain = jnp.where(jnp.sum(rel_mask) > 0, gain, 1.0)
    # true-peak guard: this graph round-trips through int16, which hard-
    # clips at ±1.0 — limit the gain so quiet-but-peaky inputs that get
    # large −23 LUFS boosts are attenuated, not clipped/distorted (the
    # host path's f32 output is clipped later by quantize_i16 anyway)
    peak = jnp.max(jnp.abs(audio)) + 1e-9
    gain = jnp.minimum(gain, 1.0 / peak)
    return audio * gain


class FusedFrontend:
    """Builds and caches the per-bucket fused programs from the live
    engines (denoiser optional → in-graph spectral-gate fallback,
    segmentation optional)."""

    def __init__(self, denoiser=None, vad=None, seg=None, spk=None):
        if vad is None or spk is None:
            raise ValueError("FusedFrontend needs VAD and speaker engines")
        self.denoiser = denoiser
        self.vad = vad
        self.seg = seg
        self.spk = spk
        self._analyze_cache: dict = {}
        self._enroll_cache: dict = {}

    # ---------------- in-graph pieces ----------------

    def _denoise_graph(self, dn_params, audio, bucket: int):
        """The full denoise_vocal chain in-graph (models/denoise.py
        DenoiseEngine semantics; reference AudioProcessor.py:601-710)."""
        if self.denoiser is None:
            from ..models.denoise import spectral_gate

            return spectral_gate(audio)
        from ..models.denoise import denoise_chain_16k

        return denoise_chain_16k(self.denoiser, dn_params, audio, bucket)

    def _preprocess_graph(self, dn_params, audio_i16, n_valid, bucket: int):
        """→ (audio_f32, audio_i16): the downloaded int16 track and the
        f32 the rest of the graph consumes are the SAME samples (the
        graph re-quantizes before feature extraction), so host-side
        engines re-running on the downloaded audio reproduce the fused
        outputs bit-for-bit."""
        valid = (jnp.arange(bucket) < n_valid).astype(jnp.float32)
        audio = audio_i16.astype(jnp.float32) / 32768.0 * valid
        audio = _masked_loudness_normalize(audio, 16000, n_valid)
        audio = self._denoise_graph(dn_params, audio, bucket) * valid
        audio = _masked_loudness_normalize(audio, 16000, n_valid)
        out_i16 = jnp.clip(jnp.round(audio * 32768.0), -32768, 32767
                           ).astype(jnp.int16)
        return out_i16.astype(jnp.float32) / 32768.0, out_i16

    @staticmethod
    def _n_frames(n_valid):
        frame, hop = 400, 160
        return jnp.where(n_valid < frame, 0, 1 + (n_valid - frame) // hop)

    # ---------------- analyze ----------------

    def _analyze_fn(self, bucket: int):
        """The raw (un-jitted) single-item analyze graph for `bucket`;
        `_build_analyze` jits it, `build_analyze_sharded` vmaps it over a
        batch axis and shards that axis over a device mesh."""
        from ..runtime.precision import cast_inputs, f32

        t_total = features.num_frames(bucket)
        n_win = 1 + (t_total - _WIN_F) // _HOP_F if t_total >= _WIN_F else 0
        vad_eng, seg_eng, spk_eng = self.vad, self.seg, self.spk

        def fn(dn_p, vad_p, seg_p, spk_p, audio_i16, n_valid):
            audio, out_i16 = self._preprocess_graph(
                dn_p, audio_i16, n_valid, bucket)
            nf = self._n_frames(n_valid)
            feats = features.fbank(audio[None])  # (1, T, 80)
            out = {"audio_i16": out_i16}
            (feats_v,) = cast_inputs(vad_eng.compute_dtype, feats)
            logits = vad_eng.model.apply(vad_p, feats_v, nf[None])
            out["vad_probs"] = f32(jax.nn.softmax(logits, axis=-1)[0, :, 1])
            if seg_eng is not None:
                (feats_s,) = cast_inputs(seg_eng.compute_dtype, feats)
                out["seg_act"] = f32(
                    seg_eng.model.apply(seg_p, feats_s, nf[None])[0])
            if n_win > 0:
                ft = jnp.swapaxes(feats[0], 0, 1)  # (80, T)
                from ..ops.stft import frame_signal

                wins = frame_signal(ft, _WIN_F, _HOP_F)  # (80, n_win, WIN_F)
                wins = jnp.transpose(wins, (1, 2, 0))  # (n_win, WIN_F, 80)
                mean = jnp.mean(wins, axis=1, keepdims=True)
                wins = wins - mean
                (wins_c,) = cast_inputs(spk_eng.compute_dtype, wins)
                out["win_embs"] = f32(spk_eng.model.apply(
                    spk_p, wins_c, jnp.full((n_win,), _WIN_F), train=False))
            return out

        return fn

    def _build_analyze(self, bucket: int):
        return jax.jit(self._analyze_fn(bucket))

    def build_analyze_sharded(self, bucket: int, mesh):
        """Batched analyze program with the batch axis sharded over the
        mesh's `data` axis: N concurrent requests (server-side batch or
        the multi-chip dryrun) run one SPMD program, params replicated,
        rows split across chips — the framework's DP inference layout
        (SURVEY.md §2.4). Returns fn(dn_p, vad_p, seg_p, spk_p,
        audio_i16 (N, bucket), n_valid (N,)) -> dict of row-sharded
        outputs."""
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        fn = self._analyze_fn(bucket)
        batched = jax.vmap(fn, in_axes=(None, None, None, None, 0, 0))
        rep = NamedSharding(mesh, P())
        rows = NamedSharding(mesh, P("data"))
        return jax.jit(
            batched,
            in_shardings=(rep, rep, rep, rep, rows, rows),
            out_shardings=rows,
        )

    def analyze(self, audio: np.ndarray, sr: int = 16000) -> dict:
        """One fused dispatch; returns host-side dict:
        audio (denoised f32), vad_probs (T,), seg_act (T', K) | None,
        win_embs (n_win, 192) | None, win_times [(s, e), ...]."""
        audio = np.asarray(audio, np.float32).ravel()
        if sr != 16000:
            from ..ops.resample import resample_poly_np

            audio = resample_poly_np(audio, 16000, sr)
            sr = 16000
        top = _LADDER.rungs[-1]
        if len(audio) > top:
            # window at the top rung and concatenate the tracks
            parts = [self.analyze(audio[i: i + top], sr)
                     for i in range(0, len(audio), top)]
            out = {
                "audio": np.concatenate([p["audio"] for p in parts]),
                "audio_dev_i16": None,  # spans multiple device buffers
                "n_samples": len(audio),
                "vad_probs": np.concatenate([p["vad_probs"] for p in parts]),
            }
            if parts[0].get("seg_act") is not None:
                out["seg_act"] = np.concatenate(
                    [p["seg_act"] for p in parts], axis=0)
            embs, times = [], []
            for i, p in enumerate(parts):
                off = i * top / 16000.0
                if p.get("win_embs") is not None:
                    embs.append(p["win_embs"])
                    times.extend([(s + off, e + off) for s, e in p["win_times"]])
            out["win_embs"] = np.concatenate(embs, axis=0) if embs else None
            out["win_times"] = times
            return out

        n = len(audio)
        bucket = _LADDER.bucket(max(n, 1))
        if bucket not in self._analyze_cache:
            self._analyze_cache[bucket] = self._build_analyze(bucket)
        fn = self._analyze_cache[bucket]
        a_i16 = np.clip(audio * 32768.0, -32768, 32767).astype(np.int16)
        dn_p = self.denoiser._params_c if self.denoiser is not None else None
        seg_p = self.seg._params_c if self.seg is not None else None
        with trace("fused/analyze"):
            dev = fn(dn_p, self.vad._params_c, seg_p, self.spk._params_c,
                     jnp.asarray(pad_to(a_i16, bucket)), jnp.asarray(n))
            host = jax.device_get(dev)  # ONE bulk transfer

        t = features.num_frames(n)
        out = {
            "audio": host["audio_i16"][:n].astype(np.float32) / 32768.0,
            # the device-resident int16 buffer, kept for the fused ASR
            # program (masked tracks built in-graph — no re-upload)
            "audio_dev_i16": dev["audio_i16"],
            "n_samples": n,
            "vad_probs": host["vad_probs"][:t],
            "seg_act": None,
            "win_embs": None,
            "win_times": [],
        }
        if "seg_act" in host:
            ds = self.seg.model.downsample
            out["seg_act"] = host["seg_act"][: max(t // ds, 1)]
        if "win_embs" in host:
            # keep only windows fully inside the valid frame range
            n_valid_win = sum(
                1 for i in range(host["win_embs"].shape[0])
                if i * _HOP_F + _WIN_F <= max(t, 0)
            )
            out["win_embs"] = host["win_embs"][:n_valid_win]
            out["win_times"] = [
                (i * _HOP_S, i * _HOP_S + _WIN_S) for i in range(n_valid_win)
            ]
        return out

    # ---------------- enroll ----------------

    def _build_enroll(self, bucket: int):
        from ..runtime.precision import cast_inputs, f32

        vad_eng, spk_eng = self.vad, self.spk

        def fn(dn_p, vad_p, spk_p, audio_i16, n_valid):
            audio, out_i16 = self._preprocess_graph(
                dn_p, audio_i16, n_valid, bucket)
            nf = self._n_frames(n_valid)
            feats = features.fbank(audio[None])  # (1, T, 80)
            t = feats.shape[1]
            fvalid = jnp.arange(t) < nf
            (feats_v,) = cast_inputs(vad_eng.compute_dtype, feats)
            logits = vad_eng.model.apply(vad_p, feats_v, nf[None])
            probs = f32(jax.nn.softmax(logits, axis=-1)[0, :, 1])
            speech = (probs > 0.5) & fvalid
            # trim to [first, last] speech frame — roll the span to the
            # front so the model's prefix mask covers exactly those
            # frames (reference trim, TargetDiarization.py:118-121)
            idx = jnp.arange(t)
            first = jnp.min(jnp.where(speech, idx, t))
            last = jnp.max(jnp.where(speech, idx, -1))
            n_in = jnp.clip(last - first + 1, 0, _MAX_EMBED_FRAMES)
            rolled = jnp.roll(feats[0], -first, axis=0)[None]  # (1, T, 80)
            pmask = (idx < n_in).astype(jnp.float32)[None, :, None]
            mean = jnp.sum(rolled * pmask, axis=1, keepdims=True) / jnp.maximum(
                jnp.sum(pmask, axis=1, keepdims=True), 1.0)
            rolled = (rolled - mean) * pmask
            (rolled_c,) = cast_inputs(spk_eng.compute_dtype, rolled)
            emb = f32(spk_eng.model.apply(spk_p, rolled_c, n_in[None],
                                          train=False))[0]
            return {"emb": emb, "vad_probs": probs, "audio_i16": out_i16}

        return jax.jit(fn)

    def enroll(self, audio: np.ndarray, sr: int = 16000) -> dict:
        """One fused dispatch: {'emb': (192,), 'vad_probs': (T,),
        'audio': denoised f32} for a target-enrollment clip."""
        audio = np.asarray(audio, np.float32).ravel()
        if sr != 16000:
            from ..ops.resample import resample_poly_np

            audio = resample_poly_np(audio, 16000, sr)
        top = _LADDER.rungs[-1]
        if len(audio) > top:
            audio = audio[:top]  # enrollment >30 s truncates like the SV input
        n = len(audio)
        bucket = _LADDER.bucket(max(n, 1))
        if bucket not in self._enroll_cache:
            self._enroll_cache[bucket] = self._build_enroll(bucket)
        fn = self._enroll_cache[bucket]
        a_i16 = np.clip(audio * 32768.0, -32768, 32767).astype(np.int16)
        dn_p = self.denoiser._params_c if self.denoiser is not None else None
        with trace("fused/enroll"):
            host = jax.device_get(fn(
                dn_p, self.vad._params_c, self.spk._params_c,
                jnp.asarray(pad_to(a_i16, bucket)), jnp.asarray(n)))
        t = features.num_frames(n)
        return {
            "emb": host["emb"],
            "vad_probs": host["vad_probs"][:t],
            "audio": host["audio_i16"][:n].astype(np.float32) / 32768.0,
        }


class StreamChunkAnalyzer:
    """ONE device program per streaming chunk decision.

    The flush cascade (streaming.should_wait_for_next_chunk, reference
    TargetDiarizationStream.py:110-171) needs, per 1 s chunk: VAD
    probabilities of the whole buffer AND of the last chunk (R2-R4),
    plus prev-buffer/chunk speaker embeddings for the speaker-change
    rule (R5). Round 1 ran these as two dispatches (frame_probs_batch +
    embed_batch); this program computes all four outputs plus the cosine
    in one dispatch — the per-chunk p50 floor becomes one tunnel RTT."""

    CHUNK_SAMPLES = 16000  # 1 s design point (demo.html:1236)
    # clients may stream larger chunks; bucket instead of truncating so
    # no chunk samples get misattributed to 'prev' in the R5 similarity
    CHUNK_LADDER = BucketLadder((16000, 32000, 64000, 160000))
    # concurrent-session row rungs: N sessions' chunk decisions coalesce
    # into one batched program (runtime/microbatch.py)
    ROW_LADDER = BucketLadder((1, 2, 4, 8))

    def __init__(self, vad, spk):
        from ..runtime import microbatch

        self.vad = vad
        self.spk = spk
        self._cache: dict = {}
        self._mb = (microbatch.MicroBatcher(self._run_batch)
                    if microbatch.enabled() else None)

    def _build(self, bucket: int, cs: int, nb: int):
        from ..runtime.precision import cast_inputs, f32

        vad_eng, spk_eng = self.vad, self.spk

        def fn(vad_p, spk_p, comb_i16, n_comb, chunk_i16, n_chunk):
            comb = comb_i16.astype(jnp.float32) / 32768.0  # (nb, bucket)
            chunk = chunk_i16.astype(jnp.float32) / 32768.0  # (nb, cs)
            nf_comb = FusedFrontend._n_frames(n_comb)  # (nb,)
            nf_chunk = FusedFrontend._n_frames(n_chunk)
            feats_c = features.fbank(comb)  # (nb, Tc, 80)
            feats_k = features.fbank(chunk)  # (nb, Tk, 80)
            (fc,) = cast_inputs(vad_eng.compute_dtype, feats_c)
            (fk,) = cast_inputs(vad_eng.compute_dtype, feats_k)
            probs_c = f32(jax.nn.softmax(
                vad_eng.model.apply(vad_p, fc, nf_comb), -1)[:, :, 1])
            probs_k = f32(jax.nn.softmax(
                vad_eng.model.apply(vad_p, fk, nf_chunk), -1)[:, :, 1])

            # embeddings: prev = combined minus the last chunk (prefix),
            # cur = the chunk — both as prefix-masked forwards
            n_prev = jnp.maximum(n_comb - n_chunk, 0)
            nf_prev = FusedFrontend._n_frames(n_prev)

            def embed(feats, nf, spk_p):
                t = feats.shape[1]
                m = (jnp.arange(t)[None, :, None] < nf[:, None, None]
                     ).astype(jnp.float32)
                mean = jnp.sum(feats * m, axis=1, keepdims=True) / jnp.maximum(
                    jnp.sum(m, axis=1, keepdims=True), 1.0)
                fn_ = (feats - mean) * m
                (fc_,) = cast_inputs(spk_eng.compute_dtype, fn_)
                return f32(spk_eng.model.apply(spk_p, fc_, nf,
                                               train=False))  # (nb, D)

            emb_prev = embed(feats_c, nf_prev, spk_p)
            emb_chunk = embed(feats_k, nf_chunk, spk_p)
            nprev = jnp.linalg.norm(emb_prev, axis=-1)
            nchunk = jnp.linalg.norm(emb_chunk, axis=-1)
            cos = jnp.where(
                (nprev > 0) & (nchunk > 0),
                jnp.sum(emb_prev * emb_chunk, -1)
                / jnp.maximum(nprev * nchunk, 1e-9),
                0.0)
            return {"probs_comb": probs_c, "probs_chunk": probs_k,
                    "similarity": cos}

        return jax.jit(fn)

    def _run_batch(self, key, items) -> list:
        """MicroBatcher callback: stack concurrent (combined, chunk)
        pairs sharing (bucket, cs) into one padded-row dispatch."""
        from ..runtime.precision import quantize_i16

        bucket, cs = key
        nb = self.ROW_LADDER.bucket(len(items))
        if (bucket, cs, nb) not in self._cache:
            self._cache[(bucket, cs, nb)] = self._build(bucket, cs, nb)
        fn = self._cache[(bucket, cs, nb)]
        comb = np.zeros((nb, bucket), np.int16)
        chk = np.zeros((nb, cs), np.int16)
        n_comb = np.ones(nb, np.int32)
        n_chunk = np.ones(nb, np.int32)
        for i, (combined, chunk) in enumerate(items):
            comb[i, : len(combined)] = quantize_i16(combined)
            chk[i, : len(chunk)] = quantize_i16(chunk)
            n_comb[i] = len(combined)
            n_chunk[i] = len(chunk)
        with trace("fused/stream_chunk"):
            host = jax.device_get(fn(
                self.vad._params_c, self.spk._params_c,
                jnp.asarray(comb), jnp.asarray(n_comb),
                jnp.asarray(chk), jnp.asarray(n_chunk)))
        out = []
        for i, (combined, chunk) in enumerate(items):
            tc = features.num_frames(len(combined))
            tk = features.num_frames(len(chunk))
            out.append({
                "probs_comb": host["probs_comb"][i, :tc],
                "probs_chunk": host["probs_chunk"][i, :tk],
                "similarity": float(host["similarity"][i]),
            })
        return out

    def analyze_chunk(self, combined: np.ndarray, chunk: np.ndarray) -> dict:
        """→ {'probs_comb', 'probs_chunk', 'similarity'} in one dispatch;
        concurrent sessions' calls coalesce into one batched dispatch."""
        combined = np.asarray(combined, np.float32)
        chunk = np.asarray(chunk, np.float32)
        top = self.CHUNK_LADDER.rungs[-1]
        chunk = chunk[-top:]
        cs = self.CHUNK_LADDER.bucket(max(len(chunk), 1))
        top = _LADDER.rungs[-1]
        combined = combined[-top:]
        bucket = _LADDER.bucket(max(len(combined), 1))
        if self._mb is not None:
            return self._mb.submit((bucket, cs), (combined, chunk))
        return self._run_batch((bucket, cs), [(combined, chunk)])[0]


class FusedSeparation:
    """Overlap-clip separation + per-stream scoring in ONE dispatch.

    The overlap branch (TargetASR.multi_speakers_separate_batch,
    reference TargetASR.py:571-656) needs, per clip: the two separated
    streams, a speaker embedding of each (target scoring), VAD segments
    of each (timerange trimming), and optionally Apollo restoration.
    Round 1 ran these as three dispatches + full-stream transfers; this
    program runs MossFormer2 → (Apollo) → fbank → VAD probs + embeddings
    in-graph and ships int16 streams + small tensors once. Clips bucket
    on a sample ladder instead of always padding to the full 10 s
    separation window."""

    LADDER = BucketLadder((32000, 64000, 96000, 160000))
    N_LADDER = BucketLadder((1, 2, 4))

    def __init__(self, sep, spk, vad=None, restorer=None):
        self.sep = sep
        self.spk = spk
        self.vad = vad
        # in-graph restore only when the restorer operates natively at 16 k
        self.restorer = restorer if (restorer is not None and
                                     getattr(restorer.model, "sr", 0) == 16000
                                     ) else None
        self._cache: dict = {}

    def _build(self, bucket: int, nb: int):
        from ..runtime.precision import cast_inputs, f32

        sep_eng, spk_eng, vad_eng, rest_eng = (
            self.sep, self.spk, self.vad, self.restorer)

        def fn(sep_p, spk_p, vad_p, rest_p, clips_i16, lengths):
            wav = clips_i16.astype(jnp.float32) / 32768.0  # (nb, bucket)
            (wav_c,) = cast_inputs(sep_eng.compute_dtype, wav)
            est = sep_eng.model.apply(sep_p, wav_c, lengths,
                                      deterministic=True)
            est = est.astype(jnp.float32)  # (nb, 2, bucket)
            streams = est.reshape(nb * 2, bucket)
            out_streams = streams
            if rest_eng is not None:
                (st_c,) = cast_inputs(rest_eng.compute_dtype, streams)
                out_streams = f32(rest_eng.model.apply(rest_p, st_c))
            # embeddings + VAD on the PRE-restore streams (legacy
            # semantics: scoring/trimming on raw separation output)
            nf = FusedFrontend._n_frames(jnp.repeat(lengths, 2))
            feats = features.fbank(streams)  # (2nb, T, 80)
            t = feats.shape[1]
            m = (jnp.arange(t)[None, :, None] < nf[:, None, None]).astype(
                jnp.float32)
            mean = jnp.sum(feats * m, axis=1, keepdims=True) / jnp.maximum(
                jnp.sum(m, axis=1, keepdims=True), 1.0)
            feats_n = (feats - mean) * m
            (fe,) = cast_inputs(spk_eng.compute_dtype, feats_n)
            embs = f32(spk_eng.model.apply(spk_p, fe, nf, train=False))
            out = {
                "streams_i16": jnp.clip(
                    jnp.round(out_streams * 32768.0), -32768, 32767
                ).astype(jnp.int16).reshape(nb, 2, bucket),
                "embs": embs.reshape(nb, 2, -1),
            }
            if vad_eng is not None:
                (fv,) = cast_inputs(vad_eng.compute_dtype, feats)
                probs = f32(jax.nn.softmax(
                    vad_eng.model.apply(vad_p, fv, nf), -1)[..., 1])
                out["vad_probs"] = probs.reshape(nb, 2, -1)
            return out

        return jax.jit(fn)

    def separate_score(self, clips: list, sr: int = 16000) -> list:
        """→ per clip {'streams': (2, n) f32, 'embs': (2, 192),
        'vads': [segments, segments]} in one dispatch."""
        from ..models.vad import VADConfig, segment_probs
        from ..ops.resample import resample_poly_np
        from ..runtime.precision import quantize_i16

        clips = [np.asarray(c, np.float32) for c in clips]
        if sr != 16000:
            clips = [resample_poly_np(c, 16000, sr) for c in clips]
        top = self.LADDER.rungs[-1]
        if not clips or any(len(c) > top or len(c) == 0 for c in clips):
            return None  # caller falls back to the windowed path
        bucket = self.LADDER.bucket(max(len(c) for c in clips))
        nb = self.N_LADDER.bucket(len(clips)) if len(clips) <= \
            self.N_LADDER.rungs[-1] else None
        if nb is None:
            return None
        key = (bucket, nb)
        if key not in self._cache:
            self._cache[key] = self._build(bucket, nb)
        fn = self._cache[key]
        batch = np.zeros((nb, bucket), np.int16)
        lengths = np.full(nb, 1, np.int32)
        for i, c in enumerate(clips):
            batch[i, : len(c)] = quantize_i16(c)
            lengths[i] = len(c)
        rest_p = self.restorer._params_c if self.restorer is not None else None
        vad_p = self.vad._params_c if self.vad is not None else None
        with trace("fused/separate"):
            host = jax.device_get(fn(
                self.sep._params_c, self.spk._params_c, vad_p, rest_p,
                jnp.asarray(batch), jnp.asarray(lengths)))
        out = []
        for i, c in enumerate(clips):
            n = len(c)
            streams = host["streams_i16"][i, :, :n].astype(np.float32) / 32768.0
            t = features.num_frames(n)
            if "vad_probs" in host:
                vads = [segment_probs(host["vad_probs"][i, j, :t], VADConfig())
                        for j in range(2)]
                dur = n / 16000.0
                vads = [[[max(0.0, s), min(dur, e)] for s, e in v]
                        for v in vads]
            else:
                vads = [[[0.0, n / 16000.0]]] * 2
            out.append({"streams": streams, "embs": host["embs"][i],
                        "vads": vads})
        return out


class FusedASR:
    """Masked multi-speaker ASR (+ in-graph punctuation) on the
    device-resident analyze audio.

    The pipeline's ASR step transcribes one silence-padded combined
    track per speaker (reference TargetDiarization.py:716-820). Those
    tracks are pure interval masks of the already-on-device denoised
    audio, so instead of assembling them on host and re-uploading
    ~n_spk × audio bytes, this program takes the analyze program's int16
    output buffer plus an (n_spk, max_segs, 2) sample-range tensor,
    builds the masked tracks in-graph, runs Paraformer, and (when the
    punctuation engine shares the ASR tokenizer) punctuates the argmax
    ids in the same program — one dispatch, ~KBs transferred."""

    N_SPK_LADDER = BucketLadder((1, 2, 4, 8))
    SEG_LADDER = BucketLadder((2, 4, 8, 16, 32))

    def __init__(self, asr_engine, punc_engine=None):
        self.asr = asr_engine
        self.punc = None
        if punc_engine is not None and \
                punc_engine.tokenizer.vocab == asr_engine.tokenizer.vocab:
            self.punc = punc_engine
        self._cache: dict = {}

    def _fn(self, bucket: int, n_spk: int, max_segs: int):
        from ..models.asr import LFR_M, LFR_N
        from ..runtime.precision import cast_inputs, f32

        asr = self.asr
        punc = self.punc

        def fn(asr_p, punc_p, audio_i16, ranges, n_lfr):
            # ranges: (n_spk, max_segs, 2) float32 sample indices
            audio = audio_i16.astype(jnp.float32) / 32768.0  # (bucket,)
            t_idx = jnp.arange(bucket, dtype=jnp.float32)[None, None, :]
            seg_m = (t_idx >= ranges[..., :1]) & (t_idx < ranges[..., 1:2])
            tracks = audio[None, :] * jnp.any(seg_m, axis=1)  # (n_spk, T)
            feats = features.fbank(tracks)
            feats = features.lfr(feats, LFR_M, LFR_N)
            if asr.cmvn is not None:
                feats = features.apply_cmvn(
                    feats, jnp.asarray(asr.cmvn[0]), jnp.asarray(asr.cmvn[1]))
            t = feats.shape[1]
            mask = (jnp.arange(t)[None, :] < n_lfr[:, None]).astype(jnp.float32)
            feats_c, mask_c = cast_inputs(asr.compute_dtype, feats, mask)
            out = asr.model.apply(asr_p, feats_c, mask_c)
            ids = jnp.argmax(out["logits"], axis=-1)  # (n_spk, U)
            res = {"ids": ids, "n_tokens": out["n_tokens"],
                   "fire_frames": out["fire_frames"]}
            if punc is not None:
                u = ids.shape[1]
                tok_mask = (jnp.arange(u)[None, :]
                            < out["n_tokens"][:, None]).astype(jnp.float32)
                (tok_mask_c,) = cast_inputs(punc.compute_dtype, tok_mask)
                plogits = f32(punc.model.apply(punc_p, ids, tok_mask_c))
                res["punc_cls"] = jnp.argmax(plogits, axis=-1)  # (n_spk, U)
            return res

        return fn

    def _build(self, bucket: int, n_spk: int, max_segs: int):
        return jax.jit(self._fn(bucket, n_spk, max_segs))

    def build_sharded(self, bucket: int, n_spk: int, max_segs: int, mesh):
        """ASR+punc program with speaker tracks sharded over the data
        axis: params + shared audio replicated, (n_spk, …) ranges /
        n_lfr / outputs partitioned on their leading dim. Each device
        transcribes its own speaker tracks — embarrassingly parallel,
        XLA inserts no collectives (SURVEY.md §2.4 plan b)."""
        from ..parallel.mesh import batch_sharding, replicated

        rep, bat = replicated(mesh), batch_sharding(mesh)
        return jax.jit(
            self._fn(bucket, n_spk, max_segs),
            in_shardings=(rep, rep, rep, bat, bat),
            out_shardings=bat,
        )

    def transcribe_masked(self, audio_dev_i16, n_samples: int,
                          spk_ranges: list) -> list:
        """spk_ranges: per speaker a list of (start_s, end_s) intervals.
        Returns per speaker {'text', 'timestamp', 'punc_cls'} (the ASR
        result contract plus per-char punctuation classes)."""
        from ..models.asr import LFR_N, fire_frames_to_timestamps

        bucket = int(audio_dev_i16.shape[-1])
        b = self.N_SPK_LADDER.bucket(max(len(spk_ranges), 1))
        max_segs = self.SEG_LADDER.bucket(
            max(max((len(r) for r in spk_ranges), default=1), 1))
        key = (bucket, b, max_segs)
        if key not in self._cache:
            self._cache[key] = self._build(bucket, b, max_segs)
        fn = self._cache[key]

        ranges = np.zeros((b, max_segs, 2), np.float32)
        n_lfr = np.ones(b, np.int32)
        for i, segs in enumerate(spk_ranges):
            end_max = 0.0
            for j, (s, e) in enumerate(segs[:max_segs]):
                ranges[i, j] = (s * 16000.0, e * 16000.0)
                end_max = max(end_max, e)
            n_valid = min(int(end_max * 16000), n_samples)
            n_lfr[i] = max(-(-features.num_frames(n_valid) // LFR_N), 1)
        punc_p = self.punc._params_c if self.punc is not None else None
        with trace("fused/asr"):
            host = jax.device_get(fn(
                self.asr._params_c, punc_p, audio_dev_i16,
                jnp.asarray(ranges), jnp.asarray(n_lfr)))

        results = []
        tok = self.asr.tokenizer
        for i in range(len(spk_ranges)):
            n_tok = int(host["n_tokens"][i])
            ids = host["ids"][i, :n_tok]
            fire = host["fire_frames"][i, :n_tok]
            ts_all = fire_frames_to_timestamps(fire, int(n_lfr[i]))
            chars, ts, pcls = [], [], []
            for j, tid in enumerate(ids):
                name = tok.vocab[int(tid)]
                if name in ("<blank>", "<s>", "</s>", "<unk>"):
                    # skip <unk> entirely: offline.sd_result_to_asr_audio
                    # re-splits with list(text), so chars/ts/pcls must
                    # stay aligned with the emitted characters
                    continue
                chars.append(name)
                if j < len(ts_all):
                    ts.append(ts_all[j])
                if "punc_cls" in host:
                    pcls.append(int(host["punc_cls"][i, j]))
            results.append({
                "text": "".join(chars),
                "timestamp": ts,
                "punc_cls": pcls if "punc_cls" in host else None,
            })
        return results
