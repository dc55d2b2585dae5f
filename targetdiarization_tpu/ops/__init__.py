from .audio import (  # noqa: F401
    db_to_gain,
    gain_to_db,
    apply_gain_db,
    to_mono,
    peak_normalize,
    mix_audio,
    rms,
)
from .resample import resample, resample_poly_np  # noqa: F401
from .stft import stft, istft, frame_signal, overlap_add  # noqa: F401
from .mel import mel_filterbank, log_mel_spectrogram  # noqa: F401
from .loudness import integrated_loudness, normalize_loudness  # noqa: F401
from .chunk import chunk_signal, merge_chunks  # noqa: F401
