"""Framework configuration: env + constructor kwargs, init-time only.

Mirrors the reference's three config mechanisms (SURVEY.md §5.6): a .env
file read at startup, constructor kwargs as the real API (env values only
override defaults when set), and per-call `more_args` dicts handled by
the pipelines. No hot reload, matching the reference (README.md:167-169).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, fields


def _load_dotenv(path: str = ".env") -> dict:
    """Minimal dotenv reader (python-dotenv is not in the image)."""
    values = {}
    if not os.path.exists(path):
        return values
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            k, _, v = line.partition("=")
            values[k.strip()] = v.strip().strip("'\"")
    return values


def _env(name, cast, default):
    raw = os.environ.get(name)
    if raw is None or raw == "":
        return default
    if cast is bool:
        return raw.lower() in ("1", "true", "yes", "on")
    return cast(raw)


@dataclass
class FrameworkConfig:
    """All init-time knobs. Field names follow the reference .env surface
    (/root/reference/.env.example) so operators can port configs 1:1."""

    # Infra
    verbose_log: bool = False
    device: str = "tpu"  # "tpu" | "cpu"
    compute_dtype: str = "bfloat16"

    # Model checkpoint dirs (empty = stage disabled, soft degradation
    # like the reference's DISABLED_PACKAGES/is_* flags, SURVEY.md §5.3)
    vad_model: str = ""
    embedding_model: str = ""
    embedding_model_name: str = "eres2netv2_large"
    diarization_model: str = ""
    segmentation_model: str = ""  # overlap detection
    denoise_model: str = ""
    separation_model: str = ""
    restoration_model: str = ""
    enhancement_model: str = ""  # Resemble-Enhance slot (FlowEnhancer)
    asr_model: str = ""
    asr_engine: str = "paraformer"
    punc_model: str = ""
    emotion_model: str = ""

    # Offline pipeline thresholds
    target_similarity_threshold: float = 0.0
    long_audio_threshold: float = 30.0
    pyannote_clustering_threshold: float = 0.0

    # Streaming knobs (reference TargetDiarizationStream.py:14-20)
    is_vad_buffer: bool = True
    max_buffer_duration: float = 30.0
    vad_min_silence: float = 0.3
    similarity_threshold: float = 0.4
    loudness_diff_threshold: float = 12.0
    chunk_duration: float = 1.0
    use_asr_prompt: bool = False

    # Quality preset 1/2/3 (reference AudioProcessor.py:225-229)
    quality: int = 2

    extra: dict = field(default_factory=dict)


def env_config(dotenv_path: str = ".env") -> FrameworkConfig:
    """Build a FrameworkConfig from .env + process env; unset values keep
    dataclass defaults (the reference's drop-Nones pattern, main.py:106-129)."""
    file_vals = _load_dotenv(dotenv_path)
    for k, v in file_vals.items():
        os.environ.setdefault(k, v)

    cfg = FrameworkConfig()
    casts = {bool: bool, int: int, float: float, str: str}
    for f in fields(FrameworkConfig):
        if f.name == "extra":
            continue
        cast = casts.get(f.type if isinstance(f.type, type) else type(getattr(cfg, f.name)))
        if cast is None:
            cast = type(getattr(cfg, f.name))
        setattr(cfg, f.name, _env(f.name.upper(), cast, getattr(cfg, f.name)))
    return cfg
