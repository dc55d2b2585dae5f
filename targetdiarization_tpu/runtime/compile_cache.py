"""Persistent XLA compilation cache + startup precompile.

Cold start measured in round 1: 97.5 s pipeline build + 262 s warmup
including compiles through the axon tunnel (BASELINE.md). Two levers:

- `enable_persistent_cache()` — jax's on-disk compilation cache keyed by
  program fingerprint; repeat server starts reuse every compiled
  program. Directory: $TD_COMPILE_CACHE or ~/.cache/targetdiarization_tpu/jax.
- `warmup_pipeline(model)` — drive one tiny silent inference through the
  offline path and one chunk through the streaming path so the hot
  buckets compile (and land in the cache) before the first request.
  Enabled at server startup with TD_WARMUP=1.
"""

from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    import jax

    cache_dir = (cache_dir or os.environ.get("TD_COMPILE_CACHE")
                 or os.path.expanduser("~/.cache/targetdiarization_tpu/jax"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # 0.05 s: build-phase param-construction programs compile in
    # 0.3-0.9 s each (~60 of them, ~40 s total) — below a 1.0 s
    # threshold they re-compile on every cold start instead of hitting
    # the local-disk cache (round-5 cold-start profile, bench.py).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.05)
    return cache_dir


def warmup_pipeline(model, seconds: float = 2.0) -> None:
    """Compile the hot paths before serving: one offline infer on a
    silent clip (fused analyze + diarize + ASR buckets) and one
    streaming chunk."""
    import numpy as np

    sr = 16000
    silent = np.zeros(int(seconds * sr), np.float32)
    try:
        model.infer(silent, sampling_rate=sr, output_target_audio=False)
    except Exception as e:  # warmup must never block serving
        print(f"offline warmup failed: {e}")
    try:
        if hasattr(model, "infer_stream"):
            chunk = np.zeros(sr, np.float32)

            def gen():
                yield chunk

            for _ in model.infer_stream(gen()):
                pass
    except Exception as e:
        print(f"streaming warmup failed: {e}")
