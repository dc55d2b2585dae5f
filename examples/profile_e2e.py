#!/usr/bin/env python
"""Per-stage wall-clock profile of the full offline pipeline on the real
device. Reuses bench.py's production-geometry builder; prints the
GLOBAL_TRACER report for one post-warmup run plus a device-dispatch
count (every jitted-program execution crossing the host↔device link).

Usage: python examples/profile_e2e.py [--fast]
"""

import contextlib
import sys
import time

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def count_dispatches():
    """Wrap the pjit execution path to count device program launches."""
    import jax._src.pjit as pjit_mod

    counter = {"n": 0, "names": []}
    orig = pjit_mod._pjit_call_impl

    def wrapped(*args, **kw):
        counter["n"] += 1
        name = kw.get("name", "?")
        counter["names"].append(name)
        return orig(*args, **kw)

    pjit_mod._pjit_call_impl = wrapped
    return counter


def main():
    fast = "--fast" in sys.argv
    from targetdiarization_tpu.runtime import trace as T

    bench.enable_compile_cache()
    wav = "/root/reference/assets/chat_mix.wav"
    target = "/root/reference/assets/female_a.wav"

    with contextlib.redirect_stdout(sys.stderr):
        td = bench.build_pipeline(fast)
        t0 = time.time()
        td.infer(wav, target_file=target, output_target_audio=False)
        print(f"warmup: {time.time() - t0:.1f}s", file=sys.stderr)

        counter = count_dispatches()
        T.reset()
        t0 = time.time()
        td.infer(wav, target_file=target, output_target_audio=False)
        wall = time.time() - t0

    print(f"\ntimed run: {wall:.3f}s  ({8.66 / wall:.1f}x realtime)")
    print(f"device dispatches: {counter['n']}")
    from collections import Counter

    for name, n in Counter(counter["names"]).most_common(40):
        print(f"  {n:3d}  {name}")
    print()
    print(T.report())


if __name__ == "__main__":
    main()
