"""JAX model zoo.

TPU-native reimplementations of every neural stage the reference invokes
through torch/onnxruntime/funasr/modelscope/pyannote (SURVEY.md §2.3/§2.5):

    features.py     fbank / LFR / CMVN front-end shared by VAD, speaker,
                    diarization and ASR models
    vad.py          FSMN-VAD + segmenting state machine (replaces both
                    FunASR FSMN-VAD and silero-vad)
    speaker.py      ERes2NetV2 / CAM++ speaker-embedding nets (192-d)
    diarization.py  sliding-window embedding diarizer + clustering and
                    the segmentation model for overlap detection
    separation.py   MossFormer2 2-speaker separator (FLASH attention)
    restoration.py  Apollo band-split restorer @44.1 kHz
    denoise.py      MDX ConvTDF U-Net vocals denoiser
    asr.py          Paraformer (SAN-M + CIF timestamps), SenseVoice
    punctuation.py  CT-Transformer punctuation restorer
"""

from . import features  # noqa: F401

# Eager imports so every architecture is in the registry before any
# from_pretrained dispatch (registration happens at import time).
from . import vad, speaker, diarization, separation, restoration  # noqa: F401,E402
from . import denoise, asr, punctuation, zoo  # noqa: F401,E402
from . import whisper_style, emotion  # noqa: F401,E402
