"""TargetDiarization-TPU: a TPU-native target-speaker diarization framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
ishine/TargetDiarization (reference: /root/reference): target-speaker
isolation + full-conversation transcription from multi-speaker audio.

Layering (mirrors reference SURVEY.md §1, re-designed TPU-first):

    serve/      REST + WebSocket + web UI servers (asyncio, stdlib)
    pipeline/   offline TargetDiarization + streaming engine
    models/     JAX model zoo (VAD, speaker, diarization, separation,
                restoration, denoise, ASR, punctuation)
    ops/        DSP kernels (resample, STFT, mel, loudness, chunking)
                + Pallas TPU kernels
    runtime/    bucketing, jit cache, parameter store, converters
    parallel/   mesh / sharding helpers (dp/tp scaling over ICI)
    train/      losses (SI-SDR/PIT/MixIT), data mixing, DP trainer
"""

__version__ = "0.1.0"


# Lazy top-level API: the reference's user-facing names importable from
# the package root without paying full import cost at package import.
_API = {
    "TargetDiarization": "targetdiarization_tpu.pipeline.offline",
    "TargetDiarizationStream": "targetdiarization_tpu.pipeline.streaming",
    "TargetASR": "targetdiarization_tpu.pipeline.target_asr",
    "AudioProcessor": "targetdiarization_tpu.processors.audio",
    "ASRProcessor": "targetdiarization_tpu.processors.asr",
}


def __getattr__(name):
    if name in _API:
        import importlib

        return getattr(importlib.import_module(_API[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
