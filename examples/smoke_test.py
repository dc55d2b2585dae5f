"""End-to-end smoke run, mirroring the reference's manual test
(/root/reference/target_diarization_test.py): offline inference on the
checked-in fixtures, then simulated streaming with 1 s chunks paced at
0.5× real time.

Run (CPU):   JAX_PLATFORMS=cpu python examples/smoke_test.py
Run (TPU):   python examples/smoke_test.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

ASSETS = "/root/reference/assets"
WAV = os.path.join(ASSETS, "chat_mix.wav")
TARGET = os.path.join(ASSETS, "female_a.wav")


def simulate_audio_stream(audio, sr, chunk_duration=1.0):
    """1 s chunks with 0.5× pacing (reference :11-22)."""
    n = int(chunk_duration * sr)
    for i in range(0, len(audio), n):
        yield audio[i: i + n]
        time.sleep(chunk_duration * 0.5)


def main():
    from targetdiarization_tpu.serve.server import build_model
    from targetdiarization_tpu.utils.audio_io import read_audio

    model = build_model()

    # ---- offline (reference :26-40) ----
    print("=== offline infer ===")
    t0 = time.time()
    target_spk, results, target_audio = model.infer(
        WAV, target_file=TARGET, output_target_audio=True)
    for item in results:
        print(item)
    print(f"target_spk: {target_spk!r}")
    print(f"Used time: {time.time() - t0:.2f}s")

    # ---- streaming (reference :42-52) ----
    print("=== streaming infer ===")
    audio, sr = read_audio(WAV)
    audio = np.asarray(audio)
    t0 = time.time()
    for spk, segs, _ in model.infer_stream(
            simulate_audio_stream(audio, sr), target_file=TARGET,
            sampling_rate=sr):
        for seg in segs:
            print(seg)
    print(f"Used time: {time.time() - t0:.2f}s")


if __name__ == "__main__":
    main()
