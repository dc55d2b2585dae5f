"""Server protocol tests: REST + WS against the real aiohttp app.

Driven with aiohttp's test client; the model is the small-engine
streaming pipeline, so these are true end-to-end protocol tests
(SURVEY.md §4 item 3: streaming-protocol tests with the simulated
generator)."""

import asyncio
import base64

import numpy as np
import pytest
from aiohttp import FormData
from aiohttp.test_utils import TestClient, TestServer

from targetdiarization_tpu.serve.server import audio_to_base64, create_app


@pytest.fixture(scope="module")
def model():
    from targetdiarization_tpu.models.asr import ASREngine, Paraformer
    from targetdiarization_tpu.models.speaker import SpeakerEngine
    from targetdiarization_tpu.models.tokenizer import CharTokenizer
    from targetdiarization_tpu.pipeline.streaming import TargetDiarizationStream
    from targetdiarization_tpu.pipeline.target_asr import TargetASR
    from targetdiarization_tpu.processors.asr import ASRProcessor
    from targetdiarization_tpu.processors.audio import AudioProcessor

    tok = CharTokenizer(vocab=["<blank>", "<s>", "</s>", "<unk>"] + list("ab一二"))
    asrp = ASRProcessor()
    asrp.asr = ASREngine(
        model=Paraformer(vocab_size=len(tok), dim=32, ffn=64, enc_layers=1,
                         dec_layers=1),
        tokenizer=tok,
    )
    tasr = TargetASR(audio_processor=AudioProcessor(), asr_processor=asrp,
                     speaker_engine=SpeakerEngine(model_name="eres2net"))
    return TargetDiarizationStream(target_asr=tasr)


def with_client(model, coro):
    """Run `coro(client)` inside one event loop with a live test client."""

    async def run():
        app = create_app(model)
        async with TestClient(TestServer(app)) as client:
            return await coro(client)

    return asyncio.run(run())


def test_root_and_health(model):
    async def steps(client):
        r = await client.get("/")
        j = await r.json()
        assert j["endpoints"]["streaming"] == "/diarization/stream"
        r = await client.get("/health")
        j = await r.json()
        assert j["status"] == "healthy" and j["model_loaded"] is True

    with_client(model, steps)


def test_rest_infer(model):
    async def steps(client):
        with open("/root/reference/assets/chat_mix.wav", "rb") as f:
            audio_bytes = f.read()
        form = FormData()
        form.add_field("audio_file", audio_bytes, filename="chat_mix.wav",
                       content_type="audio/wav")
        r = await client.post("/diarization/infer?is_single=true", data=form)
        j = await r.json()
        assert j["success"] is True, j
        d = j["data"]
        assert "results" in d and "statistics" in d
        for seg in d["results"]:
            assert set(seg) == {"speaker", "speaker_type", "timerange", "text",
                                "type", "score"}
        assert j["processing_time"] > 0

    with_client(model, steps)


def test_rest_infer_missing_audio(model):
    async def steps(client):
        r = await client.post("/diarization/infer", data=FormData())
        assert r.status in (422, 400)

    with_client(model, steps)


def test_ws_streaming_protocol(model):
    async def steps(client):
        from targetdiarization_tpu.utils.audio_io import read_audio

        audio, sr = read_audio("/root/reference/assets/chat_mix.wav")
        audio = np.asarray(audio)[: sr * 3]
        ws = await client.ws_connect("/diarization/stream")
        await ws.send_json({"type": "config",
                            "data": {"sampling_rate": sr,
                                     "has_target_file": True}})
        await ws.send_json({"type": "target_audio",
                            "data": audio_to_base64(audio[:sr])})
        ack = await ws.receive_json()
        assert ack["type"] == "config_ack"
        assert ack["data"]["target_file_loaded"] is True
        for i in range(0, len(audio), sr):
            chunk = audio[i: i + sr]
            pcm = (chunk * 32767).astype(np.int16).tobytes()
            await ws.send_json({
                "type": "audio_chunk",
                "data": base64.b64encode(pcm).decode(),
            })
        await ws.send_json({"type": "audio_end"})
        messages = []
        while True:
            msg = await asyncio.wait_for(ws.receive_json(), timeout=300)
            messages.append(msg)
            if msg["type"] in ("status", "error"):
                break
        await ws.close()
        assert messages[-1]["type"] == "status"
        assert messages[-1]["message"] == "completed"
        for m in messages[:-1]:
            assert m["type"] == "segment_result"
            seg = m["data"]["segment"]
            assert set(seg) == {"speaker", "speaker_type", "timerange", "text",
                                "type"}

    with_client(model, steps)


def test_ws_concurrent_sessions(model):
    """Two WS clients at once — per-session state isolation end-to-end."""

    async def steps(client):
        async def one_session():
            ws = await client.ws_connect("/diarization/stream")
            await ws.send_json({"type": "config", "data": {}})
            ack = await ws.receive_json()
            assert ack["type"] == "config_ack"
            pcm = np.zeros(16000, np.int16).tobytes()
            await ws.send_json({"type": "audio_chunk",
                                "data": base64.b64encode(pcm).decode()})
            await ws.send_json({"type": "audio_end"})
            while True:
                msg = await asyncio.wait_for(ws.receive_json(), timeout=300)
                if msg["type"] in ("status", "error"):
                    break
            await ws.close()
            return msg["type"]

        results = await asyncio.gather(one_session(), one_session())
        assert results == ["status", "status"]

    with_client(model, steps)


def test_web_ui_served(model):
    async def steps(client):
        r = await client.get("/target-diarization")
        text = await r.text()
        assert "Target Diarization" in text and "diarization/stream" in text

    with_client(model, steps)


def test_whisper_variant_checkpoint_mapping(tmp_path):
    """The three Whisper env names resolve to distinct checkpoints when
    present (reference ships three distinct Whisper engines,
    ASRProcessor.py:210-252), falling back to whisper-bootstrap."""
    import os

    from targetdiarization_tpu.serve.server import _asr_checkpoint_name

    repo = str(tmp_path)
    os.makedirs(os.path.join(repo, "checkpoints", "whisper-v2"))
    os.makedirs(os.path.join(repo, "checkpoints", "whisper-v3"))
    os.makedirs(os.path.join(repo, "checkpoints", "whisper-finetune"))
    assert _asr_checkpoint_name(repo, "whisper_v2") == "whisper-v2"
    assert _asr_checkpoint_name(repo, "whisper_v3") == "whisper-v3"
    assert _asr_checkpoint_name(repo, "whisper_finetune") == "whisper-finetune"
    assert _asr_checkpoint_name(repo, "whisper") == "whisper-v3"
    # fallback when a variant directory is absent
    assert _asr_checkpoint_name(str(tmp_path / "nope"), "whisper_v2") == \
        "whisper-bootstrap"
    assert _asr_checkpoint_name(repo, "sensevoice") == "sv-bootstrap"
    assert _asr_checkpoint_name(repo, "paraformer") == "asr-bootstrap"


class TestWsSoak:
    """Server-level paced WS soak (VERDICT r4 ask 8): 8 real WebSocket
    clients, 1 s pacing, ≥60 s of audio each, asserting zero XLA
    recompiles after warmup, no cross-session state bleed (segments ≡ a
    solo run), ordered timestamps, and that the server reports both
    latency families. The TPU-scale run is examples/ws_soak.py."""

    def test_paced_soak_8_sessions(self, model, chat_mix):
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "ws_soak", os.path.join(os.path.dirname(__file__), "..",
                                    "examples", "ws_soak.py"))
        soak = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(soak)

        from targetdiarization_tpu.runtime import compile_counter

        compile_counter.install()
        base, sr = chat_mix
        audio = soak.make_session_audio(base, sr, seconds=61.0)
        # solo reference run (unpaced): warms every bucket + gives the
        # expected per-session segments
        solo = asyncio.run(soak.run_soak(model, audio, sr, n_sessions=1,
                                         pace_s=0.0))[0]
        assert solo["status"]["type"] == "status", solo["status"]
        # deterministic grid prewarm + concurrent pass: coalesced
        # microbatch row-rung programs only compile under concurrency,
        # and which combos a live run visits depends on flush timing
        model.prewarm_streaming(max_sessions=8)
        asyncio.run(soak.run_soak(model, audio, sr, n_sessions=8,
                                  pace_s=0.0))
        before = compile_counter.count()
        results = asyncio.run(soak.run_soak(model, audio, sr, n_sessions=8,
                                            pace_s=1.0))
        out = soak.check_soak(results, solo_segments=solo["segments"])
        assert compile_counter.count() - before == 0, "recompile during soak"
        assert out["segments_per_session"] > 0
        assert "intake_p50_ms" in out and "emit_p50_ms" in out, out
