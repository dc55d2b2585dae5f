#!/usr/bin/env python
"""Server-level paced WebSocket soak (VERDICT r4 ask 8).

Drives N real WebSocket clients against the aiohttp server
(serve/server.py — real sockets via aiohttp's TestServer on an
ephemeral localhost port), each sending ≥60 s of audio in 1 s chunks at
the reference's real-time pacing (demo.html:1236 chunk_duration 1.0,
TargetDiarizationStream.py:14-20 1 s design point), and checks:

- ZERO XLA recompiles after the warmup session (process-wide counter,
  runtime/compile_counter.py),
- no cross-session state bleed (every session's segments equal a solo
  reference run of the same audio),
- ordered segment timestamps per session,
- both latency families, reported per session by the server in the
  completed-status message: intake p50/p90 (chunk-feed blocking) and
  emission p50/p90 (chunk arrival → segment result).

Usage (real TPU, repo root):  python examples/ws_soak.py
The pytest variant (tiny models, CPU) lives in
tests/test_server.py::TestWsSoak and reuses run_soak below.
"""

import asyncio
import base64
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def make_session_audio(base_audio: np.ndarray, sr: int,
                       seconds: float = 61.0) -> np.ndarray:
    """Tile the fixture to ≥`seconds` of audio."""
    reps = int(np.ceil(seconds * sr / len(base_audio)))
    return np.tile(np.asarray(base_audio, np.float32), reps)[
        : int(seconds * sr)]


async def _one_session(client, audio: np.ndarray, sr: int, pace_s: float,
                       timeout_s: float = 900.0) -> dict:
    """One WS client: paced chunk feed, collect segments + final metrics."""
    loop = asyncio.get_event_loop()
    ws = await client.ws_connect("/diarization/stream")
    await ws.send_json({"type": "config", "data": {"sampling_rate": sr}})
    ack = await ws.receive_json()
    assert ack["type"] == "config_ack", ack
    n = sr  # 1 s chunks
    chunks = [audio[i: i + n] for i in range(0, len(audio), n)]

    async def sender():
        next_due = loop.time()
        for c in chunks:
            if pace_s > 0:
                next_due += pace_s
                delay = next_due - loop.time()
                if delay > 0:
                    await asyncio.sleep(delay)
            pcm = np.clip(c * 32767.0, -32768, 32767).astype(np.int16)
            await ws.send_json({
                "type": "audio_chunk",
                "data": base64.b64encode(pcm.tobytes()).decode(),
            })
        await ws.send_json({"type": "audio_end"})

    sender_task = asyncio.create_task(sender())
    segments, status = [], None
    while True:
        msg = await asyncio.wait_for(ws.receive_json(), timeout=timeout_s)
        if msg["type"] == "segment_result":
            segments.append(msg["data"]["segment"])
        elif msg["type"] in ("status", "error"):
            status = msg
            break
    await sender_task
    await ws.close()
    return {"segments": segments, "status": status}


async def run_soak(model, audio: np.ndarray, sr: int, n_sessions: int = 8,
                   pace_s: float = 1.0) -> list:
    """N concurrent paced WS sessions against a fresh app around `model`.
    Returns the per-session {"segments", "status"} dicts."""
    from aiohttp.test_utils import TestClient, TestServer

    from targetdiarization_tpu.serve.server import create_app

    app = create_app(model, serve_ui=False)
    async with TestClient(TestServer(app)) as client:
        return await asyncio.gather(*[
            _one_session(client, audio, sr, pace_s)
            for _ in range(n_sessions)])


def check_soak(results: list, solo_segments: list | None = None) -> dict:
    """Assert per-session ordering (+ optional solo equality); aggregate
    the two latency families across sessions."""
    intake, emission = [], []
    for i, r in enumerate(results):
        assert r["status"] is not None and r["status"]["type"] == "status", (
            i, r["status"])
        starts = [s["timerange"][0] for s in r["segments"]]
        assert starts == sorted(starts), (i, "unordered timestamps", starts)
        if solo_segments is not None:
            got = [(s["timerange"], s["text"], s["speaker"])
                   for s in r["segments"]]
            want = [(s["timerange"], s["text"], s["speaker"])
                    for s in solo_segments]
            assert got == want, (i, "cross-session bleed", got, want)
        m = r["status"].get("metrics", {})
        if "intake_p50_ms" in m:
            intake.append((m["intake_p50_ms"], m["intake_p90_ms"]))
        if "emission_p50_ms" in m:
            emission.append((m["emission_p50_ms"], m["emission_p90_ms"]))
    out = {"sessions": len(results),
           "segments_per_session": len(results[0]["segments"])}
    if intake:
        out["intake_p50_ms"] = round(float(np.median([x[0] for x in intake])), 1)
        out["intake_p90_ms"] = round(float(np.max([x[1] for x in intake])), 1)
    if emission:
        out["emit_p50_ms"] = round(float(np.median([x[0] for x in emission])), 1)
        out["emit_p90_ms"] = round(float(np.max([x[1] for x in emission])), 1)
    return out


def main():
    import contextlib

    import bench

    bench.enable_compile_cache()
    from targetdiarization_tpu.runtime import compile_counter
    from targetdiarization_tpu.serve.server import build_model
    from targetdiarization_tpu.utils.audio_io import read_audio

    compile_counter.install()
    base, sr = read_audio("/root/reference/assets/chat_mix.wav")
    audio = make_session_audio(np.asarray(base), sr, seconds=61.0)

    with contextlib.redirect_stdout(sys.stderr):
        model = build_model()
        # solo reference session (unpaced): expected per-session segments
        solo = asyncio.run(run_soak(model, audio, sr, n_sessions=1,
                                    pace_s=0.0))[0]
        # deterministic grid prewarm + one concurrent pass: the
        # cross-session MicroBatcher's coalesced row-rung programs only
        # compile under concurrency, and which (bucket, rows) combos a
        # live run visits depends on flush timing — sweep the full grid
        model.prewarm_streaming(max_sessions=8)
        asyncio.run(run_soak(model, audio, sr, n_sessions=8, pace_s=0.0))
    compiles_before = compile_counter.count()
    t0 = time.perf_counter()
    results = asyncio.run(run_soak(model, audio, sr, n_sessions=8,
                                   pace_s=1.0))
    wall = time.perf_counter() - t0
    out = check_soak(results, solo_segments=solo["segments"])
    out.update({
        "wall_s": round(wall, 1),
        "audio_s_per_session": round(len(audio) / sr, 1),
        "recompiles_after_warmup": compile_counter.count() - compiles_before,
    })
    assert out["recompiles_after_warmup"] == 0, out
    print(json.dumps(out))


if __name__ == "__main__":
    main()
