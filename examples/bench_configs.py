#!/usr/bin/env python
"""Measure all five BASELINE.json configs on the real device.

1. FSMN-VAD + sliding embeddings on chat_mix (fused analyze)
2. Target verification: female_a enrolled, scored vs chat_mix segments
3. Separation (+restoration when shipped) on an overlap-length clip
4. Full offline infer (the driver's bench.py metric — repeated here)
5. 8 concurrent streaming sessions, p50/p90 per-chunk latency

Usage: python examples/bench_configs.py  (plain python, real TPU)
"""

import contextlib
import io
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

WAV = "/root/reference/assets/chat_mix.wav"
TARGET = "/root/reference/assets/female_a.wav"


def best_of(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import bench

    bench.enable_compile_cache()
    from targetdiarization_tpu.utils.audio_io import read_audio

    audio, sr = read_audio(WAV)
    audio = np.asarray(audio)
    target, _ = read_audio(TARGET)
    target = np.asarray(target)
    dur = len(audio) / sr
    out = {}

    with contextlib.redirect_stdout(sys.stderr):
        td = bench.build_pipeline(fast=False)
        # warmup all paths once
        td.infer(WAV, target_file=TARGET, output_target_audio=False)

        # config 1: fused analyze (preprocess+VAD+seg+sliding embeddings)
        t = best_of(lambda: td.fused.analyze(audio, sr=sr))
        out["c1_vad_embed_s"] = round(t, 4)
        out["c1_rtfx"] = round(dur / t, 1)

        # config 2: enrollment + per-speaker verification scoring
        td._enroll_cache.clear()

        def c2():
            td._enroll_cache.clear()
            emb = td._enroll_target(TARGET, sr)
            fr = td.fused.analyze(audio, sr=sr)
            sd = td._segmentation_sd(fr["audio"], 16000, fr)
            td.target_embedding_to_target_spk(emb, fr["audio"], 16000, sd,
                                              [], fr=fr)

        t = best_of(c2)
        out["c2_verify_s"] = round(t, 4)

        # config 3: separation (+restoration if shipped) on a 4 s clip
        clip = audio[: 4 * sr]
        sep = td.ap.separator

        def c3():
            s1, s2 = td.ap.separate_speaker(clip, sr)
            if td.ap.is_restore_audio:
                td.ap.restore_audio(s1, sr)

        if sep is not None:
            c3()
            t = best_of(c3, n=2)
            out["c3_separate_restore_s"] = round(t, 4)
            out["c3_rtfx"] = round(4.0 / t, 1)

        # config 4: full infer
        t = best_of(lambda: td.infer(WAV, target_file=TARGET,
                                     output_target_audio=False))
        out["c4_infer_s"] = round(t, 4)
        out["c4_rtfx"] = round(dur / t, 1)

        # config 5: 8 concurrent streaming sessions (thread pool), per-chunk
        # intake latency percentiles across all sessions. Chunks are paced
        # at the real-time 1 s cadence — the reference's own streaming
        # design point and what its smoke test does
        # (target_diarization_test.py:16-22 sleeps between chunks;
        # demo.html:1236 chunk_duration 1.0). BENCH_STREAM_PACE=0 feeds
        # chunks as fast as the pipeline pulls them instead (a
        # throughput-saturation stress: 8 sessions × ~9× real-time load
        # on one chip — intake then rides the async-flush back-pressure).
        import os as _os
        from concurrent.futures import ThreadPoolExecutor

        from targetdiarization_tpu.serve.server import build_model

        model = build_model()
        paced = _os.environ.get("BENCH_STREAM_PACE", "1") != "0"
        chunks = [audio[i: i + sr] for i in range(0, len(audio), sr)]
        lat: list = []

        emis: list = []

        def run_session(_):
            times = []
            m: dict = {}

            def gen():
                next_due = time.perf_counter()
                for c in chunks:
                    if paced:
                        next_due += 1.0
                        delay = next_due - time.perf_counter()
                        if delay > 0:
                            time.sleep(delay)
                    t0 = time.perf_counter()
                    yield c
                    times.append(time.perf_counter() - t0)

            for _ in model.infer_stream(gen(), metrics=m):
                pass
            return times, m.get("emission_s", [])

        # warmup: deterministic microbatch (bucket × row-rung) sweep —
        # 8 coalescing sessions hit row rungs a solo warm session never
        # touches — then one solo session for the host-side paths
        if hasattr(model, "prewarm_streaming"):
            model.prewarm_streaming(max_sessions=8)
        run_session(0)
        lat.clear()
        emis.clear()
        with ThreadPoolExecutor(max_workers=8) as ex:
            for times, em in ex.map(run_session, range(8)):
                lat.extend(times)
                emis.extend(em)

        def pct(vals, q):
            s = sorted(vals)
            return round(s[min(int(len(s) * q), len(s) - 1)] * 1000, 1)

        # two latency families (VERDICT r4 ask 1): intake = generator
        # pull gap per chunk (how long the session blocks the client);
        # emission = chunk arrival → segment result yielded (what a user
        # actually waits for a transcript — flushes run async, so intake
        # alone is a vacuous bound)
        out["c5_chunk_p50_ms"] = pct(lat, 0.50)
        out["c5_chunk_p90_ms"] = pct(lat, 0.90)
        if emis:
            out["c5_emit_p50_ms"] = pct(emis, 0.50)
            out["c5_emit_p90_ms"] = pct(emis, 0.90)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
