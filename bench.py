#!/usr/bin/env python
"""End-to-end benchmark: full TargetDiarization.infer on the reference
fixture, production-size models, real device.

Prints ONE JSON line on stdout:
    {"metric": "e2e_rtfx", "value": N, "unit": "x_realtime", "vs_baseline": N}

- metric: end-to-end real-time factor (audio seconds per wall second) of
  the full pipeline (preprocess → VAD → diarize → overlap-refine →
  separate → embed → ASR → assemble) on assets/chat_mix.wav.
- vs_baseline: value / 50 — the driver-set target of ≥50× real time on
  one TPU v5e chip (BASELINE.md).

Diagnostics (per-stage timings, device, compile time) go to stderr so
stdout stays machine-parseable. BENCH_FAST=1 shrinks the models for a
quick smoke run; BENCH_REPEAT sets the number of timed runs (default 2,
best counted).
"""

import contextlib
import json
import os
import sys
import time

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def _fast_params(model, *args, **kw):
    from targetdiarization_tpu.runtime.params import fast_init

    return fast_init(model, *args, **kw)


def enable_compile_cache():
    """Persistent XLA compilation cache: warmup compiles amortize across
    bench invocations on the same machine.

    The cache lives in a NON-hidden directory (`jax_cache/`) so that
    repo-staging steps that skip dotfiles still ship it (round 3's
    driver run showed cold-compile timings with zero cache traffic —
    consistent with `.jax_cache` never reaching the bench machine).
    TD_JAX_CACHE_DIR overrides (e.g. for cold-start experiments)."""
    import jax

    cache_dir = os.environ.get("TD_JAX_CACHE_DIR") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # 0.05 s (was 1.0): the build phase issues ~60 sub-second compiles
    # (fast_init param-construction programs, small helpers) totalling
    # ~40 s that a 1.0 s threshold re-compiles on EVERY cold start —
    # caching them turns that 40 s into local-disk cache reads.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.05)
    n = len(os.listdir(cache_dir))
    log(f"compile cache: {cache_dir} ({n} entries)")
    return cache_dir


class CompileStats:
    """Warmup phase breakdown (VERDICT r3 ask 1): counts XLA compiles and
    their wall seconds via jax's own 'Finished XLA compilation' log line,
    plus persistent-cache HIT/MISS lines, so the bench tail shows where
    cold-start time goes (compile vs trace/transfer/host)."""

    def __init__(self):
        import logging

        self.compile_secs = 0.0
        self.compiles = 0
        self.hits = 0
        self.misses = 0
        stats = self

        class _H(logging.Handler):
            def emit(self, record):
                msg = record.getMessage()
                if "Finished XLA compilation" in msg:
                    stats.compiles += 1
                    try:
                        stats.compile_secs += float(msg.rsplit(" in ", 1)[1].split()[0])
                    except (IndexError, ValueError):
                        pass
                elif "PERSISTENT COMPILATION CACHE MISS" in msg:
                    stats.misses += 1
                elif "Persistent compilation cache hit" in msg.lower() or \
                        "PERSISTENT COMPILATION CACHE HIT" in msg:
                    stats.hits += 1

        import jax

        jax.config.update("jax_log_compiles", True)
        h = _H()
        h.setLevel(logging.DEBUG)
        for name in ("jax._src.dispatch", "jax._src.compiler",
                     "jax._src.compilation_cache"):
            lg = logging.getLogger(name)
            lg.addHandler(h)
            if lg.level == 0 or lg.level > logging.DEBUG:
                lg.setLevel(logging.DEBUG)

    def snapshot(self):
        return (self.compiles, self.compile_secs, self.hits, self.misses)

    def delta_str(self, snap):
        c0, s0, h0, m0 = snap
        return (f"{self.compiles - c0} XLA compiles totalling "
                f"{self.compile_secs - s0:.1f}s, persistent-cache "
                f"hits={self.hits - h0} misses={self.misses - m0}")


def build_pipeline(fast: bool):
    import jax
    import jax.numpy as jnp

    from targetdiarization_tpu.models.asr import ASREngine, Paraformer
    from targetdiarization_tpu.models.diarization import (
        SegmentationEngine,
        SegmentationNet,
    )
    from targetdiarization_tpu.models.punctuation import (
        CTTransformerPunc,
        PunctuationEngine,
    )
    from targetdiarization_tpu.models.separation import MossFormer2, SeparationEngine
    from targetdiarization_tpu.models.speaker import SpeakerEngine
    from targetdiarization_tpu.models.tokenizer import CharTokenizer
    from targetdiarization_tpu.pipeline.offline import TargetDiarization
    from targetdiarization_tpu.pipeline.target_asr import TargetASR
    from targetdiarization_tpu.processors.asr import ASRProcessor
    from targetdiarization_tpu.processors.audio import AudioProcessor

    log(f"devices: {jax.devices()}")
    tok = CharTokenizer()
    if fast:
        asr_model = Paraformer(vocab_size=len(tok), dim=64, ffn=128,
                               enc_layers=2, dec_layers=1)
        sep_model = MossFormer2(dim=64, enc_channels=64, num_blocks=2,
                                group_size=64, qk_dim=32)
        spk_name = "eres2net"
        punc_model = CTTransformerPunc(vocab_size=len(tok), dim=64, ffn=128,
                                       n_layers=1)
    else:
        # production geometry: paraformer-large-ish ASR, full MossFormer2
        asr_model = Paraformer(vocab_size=len(tok), enc_layers=50, dec_layers=16)
        sep_model = MossFormer2()
        spk_name = "eres2netv2_large"
        punc_model = CTTransformerPunc(vocab_size=len(tok))

    # zero-init params via eval_shape: values are irrelevant to wall-clock,
    # and real initializers over the device tunnel dominate build time.
    # Engines construct in PARALLEL threads: each one's zeros/cast
    # programs compile independently (XLA releases the GIL), so the ~60
    # small build-phase compiles overlap instead of serializing.
    from concurrent.futures import ThreadPoolExecutor

    from targetdiarization_tpu.models.speaker import (
        _MODEL_PRESETS,
        CAMPlusPlus,
        ERes2NetV2,
    )

    ap = AudioProcessor()
    asrp = ASRProcessor()
    preset = _MODEL_PRESETS[spk_name]
    spk_model = {"ERes2NetV2": ERes2NetV2,
                 "CAMPlusPlus": CAMPlusPlus}[preset["cls"]](**preset["args"])
    seg_model = SegmentationNet()
    with ThreadPoolExecutor(max_workers=5) as ex:
        f_sep = ex.submit(lambda: SeparationEngine(
            model=sep_model,
            params=_fast_params(sep_model,
                                jnp.zeros((1, sep_model.kernel_size
                                           * sep_model.group_size)))))
        f_asr = ex.submit(lambda: ASREngine(
            model=asr_model, tokenizer=tok,
            params=_fast_params(asr_model, jnp.zeros((1, 16, 560)),
                                jnp.ones((1, 16)))))
        f_punc = ex.submit(lambda: PunctuationEngine(
            model=punc_model, tokenizer=tok,
            params=_fast_params(punc_model, jnp.zeros((1, 16), jnp.int32),
                                jnp.ones((1, 16)))))
        f_spk = ex.submit(lambda: SpeakerEngine(
            model=spk_model, model_name=spk_name,
            params=_fast_params(spk_model, jnp.zeros((1, 100, 80)),
                                jnp.array([100]))))
        f_seg = ex.submit(lambda: SegmentationEngine(
            model=seg_model,
            params=_fast_params(seg_model, jnp.zeros((1, 100, 80)),
                                jnp.array([100]))))
        ap.separator = f_sep.result()
        asrp.asr = f_asr.result()
        asrp.punc = f_punc.result()
        spk = f_spk.result()
        seg = f_seg.result()
    tasr = TargetASR(audio_processor=ap, asr_processor=asrp,
                     speaker_engine=spk)
    return TargetDiarization(target_asr=tasr, segmentation_engine=seg)


def bench_streaming():
    """BENCH_MODE=streaming: p50 per-1s-chunk wall latency through the
    streaming engine (the BASELINE.md streaming design point). Prints the
    one JSON line with vs_baseline = realtime multiple (1000 ms / p50)."""
    import statistics

    import numpy as np

    from targetdiarization_tpu.serve.server import build_model
    from targetdiarization_tpu.utils.audio_io import read_audio

    enable_compile_cache()
    wav = "/root/reference/assets/chat_mix.wav"
    with contextlib.redirect_stdout(sys.stderr):
        model = build_model()
        audio, sr = read_audio(wav)
        audio = np.asarray(audio)
        chunk = sr  # 1 s chunks (reference design point)
        state_lat = []
        # drive chunk-by-chunk measuring the engine's per-chunk handling
        for rep in range(3):  # first pass warms all compiles
            for i in range(0, len(audio) - chunk, chunk):
                t0 = time.time()
                for _ in model.process_vad_chunk(
                        model.chunk_preprocess(audio[i: i + chunk], sr),
                        False, _stream_state(model)):
                    pass
                dt = (time.time() - t0) * 1000
                if rep > 0:
                    state_lat.append(dt)
        p50 = statistics.median(state_lat)
        log(f"chunks measured: {len(state_lat)}, p50={p50:.1f} ms, "
            f"p90={sorted(state_lat)[int(len(state_lat)*0.9)]:.1f} ms")
    print(json.dumps({
        "metric": "stream_chunk_p50_ms",
        "value": round(p50, 2),
        "unit": "ms",
        "vs_baseline": round(1000.0 / max(p50, 1e-6), 3),
    }))


_STREAM_STATE = {}


def _stream_state(model):
    from targetdiarization_tpu.pipeline.streaming import StreamState

    if "s" not in _STREAM_STATE:
        _STREAM_STATE["s"] = StreamState()
    return _STREAM_STATE["s"]


def start_stack_sampler(period_s: float = 20.0):
    """Daemon thread printing the main thread's stack every `period_s`
    to stderr — identifies silent stalls during build/warmup (round 3's
    driver run had a ~5 min warmup gap with no JAX log activity)."""
    import threading
    import traceback

    main_id = threading.get_ident()

    def sample():
        while True:
            time.sleep(period_s)
            frames = sys._current_frames().get(main_id)
            if frames is None:
                return
            stack = traceback.extract_stack(frames)[-4:]
            log("[stack-sampler] main thread at: " + " <- ".join(
                f"{os.path.basename(f.filename)}:{f.lineno}:{f.name}"
                for f in reversed(stack)))

    threading.Thread(target=sample, daemon=True).start()


def main():
    if os.environ.get("BENCH_MODE") == "streaming":
        bench_streaming()
        return
    fast = os.environ.get("BENCH_FAST", "0") == "1"
    # BENCH_CHECKPOINTS=1: run the SHIPPED-checkpoint pipeline (the one
    # the quality numbers describe) instead of zero-init
    # production-geometry models — so perf and quality describe the
    # same system (round-2 verdict weak item 3)
    use_ckpts = os.environ.get("BENCH_CHECKPOINTS", "0") == "1"
    repeat = int(os.environ.get("BENCH_REPEAT", "2"))
    wav = "/root/reference/assets/chat_mix.wav"
    target = "/root/reference/assets/female_a.wav"
    if not os.path.exists(wav):
        wav = os.path.join(os.path.dirname(__file__), "assets", "chat_mix.wav")
        target = os.path.join(os.path.dirname(__file__), "assets", "female_a.wav")

    from targetdiarization_tpu.utils.audio_io import read_audio

    cache_dir = enable_compile_cache()
    stats = CompileStats()
    start_stack_sampler()
    audio, sr = read_audio(wav)
    duration = len(np.asarray(audio)) / sr
    log(f"fixture: {wav} ({duration:.2f}s @ {sr} Hz), fast={fast}")

    # keep stdout clean for the single JSON line: all pipeline prints
    # (warnings, verbose logs) go to stderr
    with contextlib.redirect_stdout(sys.stderr):
        snap = stats.snapshot()
        entries0 = len(os.listdir(cache_dir))
        t0 = time.time()
        if use_ckpts:
            from targetdiarization_tpu.serve.server import build_model

            td = build_model()
        else:
            td = build_pipeline(fast)
        t_build = time.time() - t0
        log(f"pipeline built in {t_build:.1f}s ({stats.delta_str(snap)})")

        # prewarm: compile the hot programs in parallel threads
        snap = stats.snapshot()
        tgt_audio, tgt_sr = read_audio(target)
        t_pre = td.prewarm(len(np.asarray(audio)),
                           len(np.asarray(tgt_audio)))
        log(f"parallel prewarm: {t_pre:.1f}s ({stats.delta_str(snap)})")

        # warmup: any program prewarm missed compiles here
        snap = stats.snapshot()
        t0 = time.time()
        td.infer(wav, target_file=target, output_target_audio=False)
        t_warm = time.time() - t0
        comp = stats.compile_secs - snap[1]
        log(f"warmup (incl. compile): {t_warm:.1f}s — breakdown: "
            f"{stats.delta_str(snap)}; non-compile (trace+transfer+host) "
            f"= {t_warm - comp:.1f}s")
        log(f"cache entries written this run: "
            f"{len(os.listdir(cache_dir)) - entries0}; "
            f"build+prewarm+warmup total = {t_build + t_pre + t_warm:.1f}s "
            f"(target <120s, VERDICT r3 ask 1)")

        best = float("inf")
        for i in range(repeat):
            t0 = time.time()
            td.infer(wav, target_file=target, output_target_audio=False)
            wall = time.time() - t0
            log(f"run {i}: {wall:.2f}s")
            best = min(best, wall)

    rtfx = duration / best
    print(json.dumps({
        "metric": "e2e_rtfx_checkpoints" if use_ckpts else "e2e_rtfx",
        "value": round(rtfx, 3),
        "unit": "x_realtime",
        "vs_baseline": round(rtfx / 50.0, 4),
    }))


if __name__ == "__main__":
    main()
