"""Processor hubs — standalone importable packages by design, mirroring
the reference's AudioProcessor/ASRProcessor split (README.md:54):

    audio.py  AudioProcessor: DSP + neural audio models (denoise,
              separation, restoration, enhancement)
    asr.py    ASRProcessor: VAD, ASR engines, punctuation, emotion,
              diarization, F0, language detection
"""

from .audio import AudioProcessor  # noqa: F401
from .asr import ASRProcessor  # noqa: F401
