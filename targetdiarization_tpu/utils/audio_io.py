"""Host-side audio I/O (codec decode/encode stays on CPU).

Replaces the reference's audioread/soundfile/pydub stack
(reference: AudioProcessor.py:308-348, :983-1020) with stdlib WAV
parsing plus an ffmpeg subprocess fallback for compressed formats.
Decoded audio is always returned as float32 in [-1, 1] plus a sample
rate; channel layout is (channels, samples) for multichannel and
(samples,) for mono, matching the conventions the pipeline expects.
"""

from __future__ import annotations

import io
import os
import shutil
import struct
import subprocess
import wave

import numpy as np

_FFMPEG = shutil.which("ffmpeg")


def _pcm_to_float32(raw: bytes, sampwidth: int, nchannels: int) -> np.ndarray:
    """Decode interleaved PCM bytes to float32 in [-1, 1], shape (C, T)."""
    if sampwidth == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sampwidth == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif sampwidth == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sampwidth == 3:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        i = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        i = np.where(i >= 1 << 23, i - (1 << 24), i)
        x = i.astype(np.float32) / float(1 << 23)
    else:
        raise ValueError(f"unsupported PCM sample width: {sampwidth}")
    if nchannels > 1:
        x = x.reshape(-1, nchannels).T
    return x


def read_wav(path_or_bytes) -> tuple[np.ndarray, int]:
    """Read a PCM WAV file. Returns (audio float32 (T,) or (C, T), sr)."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        fobj = io.BytesIO(path_or_bytes)
    else:
        fobj = open(path_or_bytes, "rb")
    try:
        with wave.open(fobj) as w:
            sr = w.getframerate()
            nch = w.getnchannels()
            raw = w.readframes(w.getnframes())
            audio = _pcm_to_float32(raw, w.getsampwidth(), nch)
    finally:
        fobj.close()
    return audio, sr


def _read_via_ffmpeg(path: str) -> tuple[np.ndarray, int]:
    """Decode any ffmpeg-supported format to float32 PCM."""
    if _FFMPEG is None:
        raise RuntimeError(
            f"cannot decode {path!r}: not a PCM WAV and ffmpeg is unavailable"
        )
    probe = subprocess.run(
        [_FFMPEG, "-i", path, "-f", "f32le", "-acodec", "pcm_f32le", "-"],
        capture_output=True,
        check=True,
    )
    # Parse the sample rate / channels from stderr ("Stream ... 16000 Hz, mono").
    sr, nch = 16000, 1
    for line in probe.stderr.decode("utf-8", "ignore").splitlines():
        if "Audio:" in line:
            for tok in line.split(","):
                tok = tok.strip()
                if tok.endswith("Hz"):
                    sr = int(tok.split()[0])
                elif tok in ("mono",):
                    nch = 1
                elif tok in ("stereo",):
                    nch = 2
                elif "channels" in tok:
                    nch = int(tok.split()[0])
    x = np.frombuffer(probe.stdout, dtype="<f4").astype(np.float32)
    if nch > 1:
        x = x.reshape(-1, nch).T
    return x, sr


def read_audio(path, sample_rate: int | None = None) -> tuple[np.ndarray, int]:
    """Read an audio file of any supported format.

    Mirrors AudioProcessor.read_audio (reference AudioProcessor.py:308):
    returns float32 audio plus sample rate; optionally resamples on host
    (resampling on device lives in ops.resample).
    """
    try:
        audio, sr = read_wav(path)
    except (wave.Error, EOFError, struct.error):
        audio, sr = _read_via_ffmpeg(os.fspath(path))
    if sample_rate is not None and sample_rate != sr:
        from ..ops.resample import resample_poly_np

        audio = resample_poly_np(audio, sample_rate, sr)
        sr = sample_rate
    return audio, sr


def write_wav(path, audio: np.ndarray, sample_rate: int) -> None:
    """Write float32 audio ((T,) or (C, T)) as 16-bit PCM WAV."""
    audio = np.asarray(audio)
    if audio.ndim == 2:
        interleaved = audio.T
        nch = audio.shape[0]
    else:
        interleaved = audio
        nch = 1
    pcm = np.clip(interleaved * 32768.0, -32768, 32767).astype("<i2")
    with wave.open(os.fspath(path), "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())


def write_audio(path, audio: np.ndarray, sample_rate: int) -> None:
    """Write audio; WAV natively, other extensions via ffmpeg.

    Mirrors AudioProcessor.write_to_file (reference AudioProcessor.py:983).
    """
    path = os.fspath(path)
    if path.lower().endswith(".wav") or _FFMPEG is None:
        write_wav(path, audio, sample_rate)
        return
    tmp = path + ".tmp.wav"
    write_wav(tmp, audio, sample_rate)
    try:
        subprocess.run([_FFMPEG, "-y", "-i", tmp, path], capture_output=True, check=True)
    finally:
        os.unlink(tmp)


def float32_to_int16_bytes(audio: np.ndarray) -> bytes:
    """float32 [-1,1] → interleaved little-endian int16 bytes (WS protocol)."""
    return np.clip(np.asarray(audio) * 32768.0, -32768, 32767).astype("<i2").tobytes()


def int16_bytes_to_float32(raw: bytes) -> np.ndarray:
    """Interleaved little-endian int16 bytes → float32 [-1,1] (WS protocol)."""
    return np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
