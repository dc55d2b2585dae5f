"""Command-line interface.

    python -m targetdiarization_tpu infer AUDIO [--target T] [--single]
                                           [--output-json R] [--output-audio W]
    python -m targetdiarization_tpu stream AUDIO [--chunk 1.0] [--target T]
    python -m targetdiarization_tpu serve [--host H] [--port 8000]
    python -m targetdiarization_tpu bench [--fast]

Mirrors the reference's entry points: library smoke usage
(target_diarization_test.py), uvicorn serving (main.py:394-401) and the
Gradio UI (webui.py) — the web UI here is served by `serve` at
/target-diarization.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _build_stream_model():
    from .serve.server import build_model

    return build_model()


def cmd_infer(args):
    import numpy as np

    model = _build_stream_model()
    t0 = time.time()
    target_spk, results, target_audio = model.infer(
        args.audio, target_file=args.target, is_single=args.single,
        output_target_audio=args.output_audio is not None)
    print(f"Used time: {time.time() - t0:.2f}s", file=sys.stderr)
    out = {"target_speaker_id": target_spk, "results": results}
    text = json.dumps(out, ensure_ascii=False, indent=2)
    if args.output_json:
        with open(args.output_json, "w", encoding="utf-8") as f:
            f.write(text)
    else:
        print(text)
    if args.output_audio and target_audio is not None:
        from .utils.audio_io import write_audio

        write_audio(args.output_audio, np.asarray(target_audio), 16000)
        print(f"target audio → {args.output_audio}", file=sys.stderr)


def cmd_stream(args):
    """Simulated streaming on a file, like the reference smoke test
    (target_diarization_test.py:11-22: 1 s chunks, 0.5× realtime pacing)."""
    import numpy as np

    from .utils.audio_io import read_audio

    model = _build_stream_model()
    audio, sr = read_audio(args.audio)
    audio = np.asarray(audio)

    def generator():
        n = int(args.chunk * sr)
        for i in range(0, len(audio), n):
            yield audio[i: i + n]
            time.sleep(args.chunk * args.pace)

    for target_spk, results, _ in model.infer_stream(
            generator(), target_file=args.target, sampling_rate=sr,
            is_single=args.single):
        for seg in results:
            print(json.dumps({"target_speaker_id": target_spk, **seg},
                             ensure_ascii=False))


def cmd_serve(args):
    from .serve.server import run_server

    run_server(host=args.host, port=args.port)


def cmd_bench(args):
    import os
    import subprocess

    env = dict(os.environ)
    if args.fast:
        env["BENCH_FAST"] = "1"
    bench = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py")
    raise SystemExit(subprocess.call([sys.executable, bench], env=env))


def main(argv=None):
    parser = argparse.ArgumentParser(prog="targetdiarization_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("infer", help="offline target diarization + ASR")
    p.add_argument("audio")
    p.add_argument("--target", default=None)
    p.add_argument("--single", action="store_true")
    p.add_argument("--output-json", default=None)
    p.add_argument("--output-audio", default=None)
    p.set_defaults(fn=cmd_infer)

    p = sub.add_parser("stream", help="simulated real-time streaming on a file")
    p.add_argument("audio")
    p.add_argument("--target", default=None)
    p.add_argument("--single", action="store_true")
    p.add_argument("--chunk", type=float, default=1.0)
    p.add_argument("--pace", type=float, default=0.0,
                   help="sleep chunk·pace between chunks (0.5 = reference)")
    p.set_defaults(fn=cmd_stream)

    p = sub.add_parser("serve", help="REST + WebSocket API server")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("bench", help="run the end-to-end benchmark")
    p.add_argument("--fast", action="store_true")
    p.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
