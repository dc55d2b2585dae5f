"""ctypes binding for the native host runtime (native/tdaudio.cpp).

Loads libtdaudio.so (built by native/build.sh; auto-built on first use
when a compiler is present) and exposes:

    pcm16_to_f32 / f32_to_pcm16      WS-protocol PCM marshalling
    integrated_loudness_native       BS.1770-4 gated LUFS on host —
                                     removes a device round trip per
                                     streaming chunk (1 s cadence)
    resample_linear                  quick host-rate conversion
    RingBuffer                       SPSC float ring for stream ingest

Everything degrades to numpy/jnp when the library is unavailable
(TD_DISABLE_NATIVE=1 forces the fallback).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    return os.path.normpath(os.path.join(here, "..", "..", "native",
                                         "libtdaudio.so"))


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("TD_DISABLE_NATIVE") == "1":
        return None
    path = _lib_path()
    if not os.path.exists(path):
        build = os.path.join(os.path.dirname(path), "build.sh")
        if os.path.exists(build):
            try:
                subprocess.run(["sh", build], capture_output=True, check=True,
                               timeout=120)
            except Exception:
                return None
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    i16p = ctypes.POINTER(ctypes.c_int16)
    lib.pcm16_to_f32.argtypes = [i16p, f32p, ctypes.c_size_t]
    lib.f32_to_pcm16.argtypes = [f32p, i16p, ctypes.c_size_t]
    lib.integrated_loudness.argtypes = [f32p, ctypes.c_size_t, ctypes.c_int]
    lib.integrated_loudness.restype = ctypes.c_double
    lib.resample_linear.argtypes = [f32p, ctypes.c_size_t, f32p, ctypes.c_size_t]
    lib.ring_create.argtypes = [ctypes.c_size_t]
    lib.ring_create.restype = ctypes.c_void_p
    lib.ring_free.argtypes = [ctypes.c_void_p]
    lib.ring_push.argtypes = [ctypes.c_void_p, f32p, ctypes.c_size_t]
    lib.ring_push.restype = ctypes.c_size_t
    lib.ring_pop.argtypes = [ctypes.c_void_p, f32p, ctypes.c_size_t]
    lib.ring_pop.restype = ctypes.c_size_t
    lib.ring_size.argtypes = [ctypes.c_void_p]
    lib.ring_size.restype = ctypes.c_size_t
    lib.ring_space.argtypes = [ctypes.c_void_p]
    lib.ring_space.restype = ctypes.c_size_t
    _LIB = lib
    return _LIB


def has_native() -> bool:
    return _load() is not None


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def pcm16_to_f32(pcm: np.ndarray) -> np.ndarray:
    pcm = np.ascontiguousarray(pcm, dtype=np.int16)
    lib = _load()
    if lib is None:
        return (pcm.astype(np.float32) / 32768.0).astype(np.float32)
    out = np.empty(pcm.size, np.float32)
    lib.pcm16_to_f32(
        pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), _f32p(out), pcm.size)
    return out.reshape(pcm.shape)


def f32_to_pcm16(audio: np.ndarray) -> np.ndarray:
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    lib = _load()
    if lib is None:
        return np.clip(audio * 32768.0, -32768, 32767).astype(np.int16)
    out = np.empty(audio.size, np.int16)
    lib.f32_to_pcm16(
        _f32p(audio), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        audio.size)
    return out.reshape(audio.shape)


def integrated_loudness_native(audio: np.ndarray, sr: int) -> float:
    """Host-side BS.1770-4 LUFS; jnp fallback when lib missing."""
    audio = np.ascontiguousarray(audio, dtype=np.float32).ravel()
    lib = _load()
    if lib is None:
        import jax.numpy as jnp

        from ..ops.loudness import integrated_loudness

        return float(integrated_loudness(jnp.asarray(audio), sr))
    return float(lib.integrated_loudness(_f32p(audio), audio.size, sr))


def resample_linear(audio: np.ndarray, n_out: int) -> np.ndarray:
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    lib = _load()
    if lib is None:
        if len(audio) == 0 or n_out == 0:
            return np.zeros(n_out, np.float32)
        pos = np.linspace(0, len(audio) - 1, n_out)
        return np.interp(pos, np.arange(len(audio)), audio).astype(np.float32)
    out = np.empty(n_out, np.float32)
    lib.resample_linear(_f32p(audio), audio.size, _f32p(out), n_out)
    return out


class RingBuffer:
    """SPSC float ring buffer; numpy fallback is a simple deque-backed
    buffer with identical semantics."""

    def __init__(self, capacity: int):
        self.capacity = capacity
        self._lib = _load()
        if self._lib is not None:
            self._h = self._lib.ring_create(capacity)
        else:
            self._buf = np.zeros(0, np.float32)

    def push(self, x: np.ndarray) -> int:
        x = np.ascontiguousarray(x, dtype=np.float32).ravel()
        if self._lib is not None:
            return int(self._lib.ring_push(self._h, _f32p(x), x.size))
        space = self.capacity - len(self._buf)
        n = min(space, x.size)
        self._buf = np.concatenate([self._buf, x[:n]])
        return n

    def pop(self, n: int) -> np.ndarray:
        if self._lib is not None:
            out = np.empty(n, np.float32)
            got = int(self._lib.ring_pop(self._h, _f32p(out), n))
            return out[:got]
        got = min(n, len(self._buf))
        out, self._buf = self._buf[:got], self._buf[got:]
        return out

    def __len__(self) -> int:
        if self._lib is not None:
            return int(self._lib.ring_size(self._h))
        return len(self._buf)

    def space(self) -> int:
        if self._lib is not None:
            return int(self._lib.ring_space(self._h))
        return self.capacity - len(self._buf)

    def __del__(self):
        if getattr(self, "_lib", None) is not None and getattr(self, "_h", None):
            self._lib.ring_free(self._h)
            self._h = None
