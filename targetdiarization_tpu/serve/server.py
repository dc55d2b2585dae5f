"""REST + WebSocket server (aiohttp).

Wire-compatible re-creation of the reference's FastAPI/uvicorn server
(/root/reference/main.py; fastapi is not in this image — aiohttp is the
native asyncio stack here and serves both HTTP and WS from one app):

  GET  /                     service banner (main.py:141-151)
  GET  /health               {"status", "model_loaded", "timestamp"} (:155-161)
  POST /diarization/infer    multipart audio_file [+ target_file] →
                             DiarizationResponse JSON (:165-241)
  WS   /diarization/stream   config JSON → [target_audio] → config_ack →
                             audio_chunk (base64 int16) stream →
                             segment_result per segment → status completed
                             (:245-304)

Streaming concurrency keeps the reference's thread-bridge design
(ThreadPoolExecutor + queue bridging the sync generator pipeline into
asyncio, main.py:308-391) but state is per-session by construction
(pipeline.streaming.StreamState), so concurrent WS clients are safe —
the fix SURVEY.md §5.2 calls for.
"""

from __future__ import annotations

import asyncio
import base64
import json
import logging
import os
import queue
import tempfile
import threading
import time
import traceback

import numpy as np

try:
    from aiohttp import web, WSMsgType

    HAS_AIOHTTP = True
except Exception:  # pragma: no cover
    HAS_AIOHTTP = False

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
)
logger = logging.getLogger("targetdiarization_tpu.serve")


def format_speaker_info(speaker_id: str, target_speaker_id: str) -> str:
    if speaker_id == target_speaker_id:
        return "target"
    if speaker_id == "-1":
        return "uncertain"
    return "other"


def audio_to_base64(audio_data) -> str:
    if audio_data is None:
        return ""
    audio_data = np.asarray(audio_data)
    if audio_data.dtype == np.float32:
        audio_data = (audio_data * 32767).astype(np.int16)
    return base64.b64encode(audio_data.tobytes()).decode("utf-8")


def base64_to_audio(data: str) -> np.ndarray:
    raw = base64.b64decode(data)
    return np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32767.0


def _asr_checkpoint_name(repo: str, asr_engine: str) -> str:
    """Default checkpoint per ASR engine. The three Whisper env names
    are REAL variants with their own checkpoints (the reference ships
    three distinct Whisper engines, ASRProcessor.py:210-252):
    whisper_v2 → compact geometry, whisper_v3 → large geometry (also
    the bare-\"whisper\" default), whisper_finetune → v3 geometry
    fine-tuned through the pipeline's preprocess chain. Each falls back
    to the generic whisper-bootstrap when its directory is absent."""
    eng = str(asr_engine)
    if eng.startswith("whisper"):
        variant = {"whisper_v2": "whisper-v2",
                   "whisper_v3": "whisper-v3",
                   "whisper_finetune": "whisper-finetune",
                   "whisper": "whisper-v3"}.get(eng, "whisper-v3")
        if os.path.exists(os.path.join(repo, "checkpoints", variant)):
            return variant
        return "whisper-bootstrap"
    if eng == "sensevoice":
        return "sv-bootstrap"
    return "asr-bootstrap"


def build_model(config=None):
    """Construct the TargetDiarizationStream singleton from env config
    (reference startup_event, main.py:101-137)."""
    from ..runtime.config import env_config
    from ..pipeline.streaming import TargetDiarizationStream
    from ..pipeline.target_asr import TargetASR
    from ..processors.asr import ASRProcessor
    from ..processors.audio import AudioProcessor

    cfg = config or env_config()
    # persistent XLA compilation cache: first-run compiles (~minutes over
    # a remote-TPU link) amortize across server restarts (round-1 weak
    # item 8 — cold start)
    from ..runtime.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    # default to the shipped bootstrap checkpoints when a stage has no
    # configured model (train/recipes.py produces these from the fixture
    # audio; see README "Checkpoints")
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    # Separator default: the production-geometry trained checkpoint
    # (512-dim/24-block, the reference MossFormer2 scale) on accelerator
    # backends; the compact 256/12 on CPU, where 512/24 costs ~22 s per
    # 4 s clip and would dominate CI wall time. TD_SEP_CHECKPOINT
    # overrides either way.
    sep_name = os.environ.get("TD_SEP_CHECKPOINT", "")
    if not sep_name:
        try:
            import jax as _jax

            on_accel = _jax.default_backend() != "cpu"
        except Exception:
            on_accel = False
        sep_name = "sep-bootstrap-512" if (
            on_accel and os.path.exists(
                os.path.join(repo, "checkpoints", "sep-bootstrap-512"))
        ) else "sep-bootstrap"
    defaults = {
        "vad_model": os.path.join(repo, "checkpoints", "vad-bootstrap"),
        "separation_model": os.path.join(repo, "checkpoints", sep_name),
        "embedding_model": os.path.join(repo, "checkpoints", "spk-bootstrap"),
        "segmentation_model": os.path.join(repo, "checkpoints", "seg-bootstrap"),
        "denoise_model": os.path.join(repo, "checkpoints", "den-bootstrap"),
        "restoration_model": os.path.join(repo, "checkpoints", "rest-bootstrap"),
        "enhancement_model": os.path.join(repo, "checkpoints", "enh-bootstrap"),
        "asr_model": os.path.join(
            repo, "checkpoints", _asr_checkpoint_name(repo, cfg.asr_engine)),
        "punc_model": os.path.join(repo, "checkpoints", "punc-bootstrap"),
        "emotion_model": os.path.join(repo, "checkpoints", "emo-bootstrap"),
    }
    for field, path in defaults.items():
        if not getattr(cfg, field) and os.path.exists(path):
            setattr(cfg, field, path)
            logger.info(f"using bootstrap checkpoint for {field}: {path}")
    # multi-chip serving: when more than one device is visible, the
    # separation engine (the heaviest batched forward) runs
    # batch-sharded over a 1-D data mesh (SURVEY.md §2.4 plan b);
    # single-chip deployments are unaffected. Opt out: TD_SERVE_MESH=0.
    mesh = None
    try:
        import jax

        if (os.environ.get("TD_SERVE_MESH", "1") != "0"
                and len(jax.devices()) > 1):
            from ..parallel.mesh import make_mesh

            mesh = make_mesh()
            logger.info(
                f"serving with a {mesh.devices.size}-device data mesh")
    except Exception:
        mesh = None
    ap = AudioProcessor(
        denoise_model=cfg.denoise_model,
        separation_model=cfg.separation_model,
        restoration_model=cfg.restoration_model,
        enhancement_model=cfg.enhancement_model,
        quality=cfg.quality,
        verbose_log=cfg.verbose_log,
        mesh=mesh,
    )
    asrp = ASRProcessor(
        vad_model=cfg.vad_model,
        asr_model=cfg.asr_model,
        asr_engine=cfg.asr_engine,
        punc_model=cfg.punc_model,
        emotion_model=cfg.emotion_model,
        verbose_log=cfg.verbose_log,
    )
    tasr = TargetASR(
        audio_processor=ap,
        asr_processor=asrp,
        embedding_model=cfg.embedding_model,
        embedding_model_name=cfg.embedding_model_name,
        verbose_log=cfg.verbose_log,
    )
    seg = None
    if cfg.segmentation_model and os.path.exists(cfg.segmentation_model):
        from ..models.diarization import SegmentationEngine

        seg = SegmentationEngine.from_pretrained(cfg.segmentation_model)
    return TargetDiarizationStream(
        target_asr=tasr,
        segmentation_engine=seg,
        asr_engine=cfg.asr_engine,
        target_similarity_threshold=cfg.target_similarity_threshold,
        pyannote_clustering_threshold=cfg.pyannote_clustering_threshold,
        verbose_log=cfg.verbose_log,
        is_vad_buffer=cfg.is_vad_buffer,
        use_asr_prompt=cfg.use_asr_prompt,
        similarity_threshold=cfg.similarity_threshold,
        vad_min_silence=cfg.vad_min_silence,
        max_buffer_duration=cfg.max_buffer_duration,
        loudness_diff_threshold=cfg.loudness_diff_threshold,
    )


# ---------------- handlers ----------------


async def handle_root(request):
    return web.json_response({
        "message": "Target Diarization API",
        "version": "1.0.0",
        "endpoints": {
            "inference": "/diarization/infer",
            "streaming": "/diarization/stream",
            "health": "/health",
        },
    })


async def handle_health(request):
    return web.json_response({
        "status": "healthy",
        "model_loaded": request.app.get("model") is not None,
        "timestamp": int(time.time()),
    })


async def handle_infer(request):
    start_time = time.time()
    model = request.app.get("model")
    tmp_files = []
    try:
        if model is None:
            return web.json_response(
                {"success": False, "error": "Model not loaded"}, status=500)
        audio_path = None
        target_path = None
        params = {"sampling_rate": 16000, "is_single": False,
                  "output_target_audio": True}
        try:
            reader = await request.multipart()
        except Exception:
            return web.json_response(
                {"success": False, "error": "multipart form data required"},
                status=422)
        async for part in reader:
            if part.name in ("audio_file", "target_file"):
                suffix = os.path.splitext(part.filename or "a.wav")[1] or ".wav"
                fd, path = tempfile.mkstemp(suffix=suffix)
                with os.fdopen(fd, "wb") as f:
                    f.write(await part.read(decode=False))
                tmp_files.append(path)
                if part.name == "audio_file":
                    audio_path = path
                else:
                    target_path = path
            elif part.name in params:
                raw = (await part.read(decode=False)).decode()
                if part.name == "sampling_rate":
                    params[part.name] = int(raw)
                else:
                    params[part.name] = raw.lower() in ("1", "true", "yes")
        # query-string overrides (FastAPI accepted them as query params)
        for key in params:
            if key in request.query:
                raw = request.query[key]
                params[key] = int(raw) if key == "sampling_rate" else raw.lower() in ("1", "true", "yes")
        if audio_path is None:
            return web.json_response(
                {"success": False, "error": "audio_file is required"}, status=422)

        loop = asyncio.get_event_loop()
        target_spk, final_result, target_audio = await loop.run_in_executor(
            None,
            lambda: model.infer(
                wav_file=audio_path, target_file=target_path,
                sampling_rate=params["sampling_rate"],
                is_single=params["is_single"],
                output_target_audio=params["output_target_audio"]),
        )
        results = [
            {
                "speaker": r["speaker"],
                "speaker_type": format_speaker_info(r["speaker"], target_spk),
                "timerange": list(r["timerange"]),
                "text": r["text"],
                "type": r["type"],
                "score": r.get("score", -1.0),
            }
            for r in final_result
        ]
        data = {
            "target_speaker_id": target_spk,
            "total_speakers": len({r["speaker"] for r in final_result
                                   if r["speaker"] != "-1"}),
            "results": results,
            "statistics": {
                "total_duration": round(
                    max((r["timerange"][1] for r in final_result), default=0.0), 3),
                "target_speaker_duration": round(sum(
                    r["timerange"][1] - r["timerange"][0]
                    for r in final_result if r["speaker"] == target_spk), 3),
                "other_speakers_duration": round(sum(
                    r["timerange"][1] - r["timerange"][0]
                    for r in final_result
                    if r["speaker"] != target_spk and r["speaker"] != "-1"), 3),
            },
        }
        if params["output_target_audio"] and target_audio is not None:
            data["target_audio_base64"] = audio_to_base64(target_audio)
        return web.json_response({
            "success": True,
            "data": data,
            "error": None,
            "processing_time": round(time.time() - start_time, 3),
        })
    except Exception as e:
        traceback.print_exc()
        return web.json_response({
            "success": False,
            "data": None,
            "error": f"Inference failed: {e}",
            "processing_time": round(time.time() - start_time, 3),
        })
    finally:
        for path in tmp_files:
            try:
                os.unlink(path)
            except OSError:
                pass


async def handle_stream(request):
    ws = web.WebSocketResponse()
    await ws.prepare(request)
    model = request.app.get("model")
    try:
        if model is None:
            await ws.send_json({"type": "error", "message": "Model not loaded"})
            return ws
        config_message = await _receive_json(ws)
        if config_message is None:
            return ws
        config = config_message.get("data", {})
        target_audio = None
        if config.get("has_target_file", False):
            target_message = await _receive_json(ws)
            if target_message and target_message.get("type") == "target_audio":
                target_audio = base64_to_audio(target_message.get("data", ""))
        await ws.send_json({
            "type": "config_ack",
            "data": {"config": config,
                     "target_file_loaded": target_audio is not None},
        })

        async def audio_generator():
            while True:
                message = await _receive_json(ws)
                if message is None:
                    break
                if message.get("type") == "audio_chunk":
                    yield base64_to_audio(message.get("data", ""))
                elif message.get("type") == "audio_end":
                    break

        session_metrics: dict = {}
        async for target_spk, asr_result, _ in _async_infer_stream(
                model, audio_generator(), target_audio, config,
                metrics=session_metrics):
            for segment in asr_result:
                await ws.send_json({
                    "type": "segment_result",
                    "data": {
                        "target_speaker_id": target_spk,
                        "segment": {
                            "speaker": segment["speaker"],
                            "speaker_type": format_speaker_info(
                                segment["speaker"], target_spk),
                            "timerange": segment["timerange"],
                            "text": segment["text"],
                            "type": segment["type"],
                        },
                    },
                })
        status = {"type": "status", "message": "completed"}
        summary = _latency_summary(session_metrics)
        if summary:
            # additive field: per-session latency percentiles for both
            # families — intake (how long the pipeline blocks the chunk
            # feed) and emission (chunk arrival → segment result)
            status["metrics"] = summary
        await ws.send_json(status)
    except Exception as e:
        try:
            await ws.send_json({"type": "error",
                                "message": f"Processing error: {e}"})
        except Exception:
            pass
    return ws


async def _receive_json(ws):
    msg = await ws.receive()
    if msg.type != WSMsgType.TEXT:
        return None
    return json.loads(msg.data)


def _latency_summary(metrics: dict) -> dict:
    """p50/p90 (ms) per latency family collected during a session."""

    def pct(vals, q):
        s = sorted(vals)
        return round(s[min(int(len(s) * q), len(s) - 1)] * 1000.0, 1)

    out = {}
    for fam, key in (("intake", "intake_s"), ("emission", "emission_s")):
        vals = metrics.get(key) or []
        if vals:
            out[f"{fam}_p50_ms"] = pct(vals, 0.50)
            out[f"{fam}_p90_ms"] = pct(vals, 0.90)
            out[f"{fam}_n"] = len(vals)
    return out


async def _async_infer_stream(model, audio_generator, target_file, config,
                              metrics=None):
    """async WS loop ↔ sync generator pipeline bridge
    (reference main.py:308-391 thread+queue design).

    `metrics`: optional dict collecting per-chunk intake latency
    ("intake_s": how long the pipeline blocks between chunk pulls) and,
    via the pipeline, per-segment emission latency ("emission_s")."""
    audio_queue: queue.Queue = queue.Queue()
    finished = threading.Event()
    loop = asyncio.get_event_loop()
    result_queue: asyncio.Queue = asyncio.Queue()
    inference_done = asyncio.Event()

    async def collector():
        try:
            async for chunk in audio_generator:
                audio_queue.put(chunk)
        except Exception as e:
            logger.error(f"Audio collection error: {e}")
        finally:
            audio_queue.put(None)
            finished.set()

    def sync_generator():
        while True:
            try:
                chunk = audio_queue.get(timeout=0.1)
            except queue.Empty:
                if finished.is_set() and audio_queue.empty():
                    return
                continue
            if chunk is None:
                return
            t0 = time.perf_counter()
            yield chunk
            if metrics is not None:
                metrics.setdefault("intake_s", []).append(
                    time.perf_counter() - t0)

    def run_inference():
        try:
            for result in model.infer_stream(
                    audio_stream_generator=sync_generator(),
                    target_file=target_file,
                    sampling_rate=config.get("sampling_rate", 16000),
                    is_single=config.get("is_single", False),
                    output_target_audio=config.get("output_target_audio", False),
                    metrics=metrics):
                asyncio.run_coroutine_threadsafe(
                    result_queue.put(result), loop).result()
        except Exception as e:
            traceback.print_exc()
            logger.error(f"Inference thread error: {e}")
        finally:
            loop.call_soon_threadsafe(inference_done.set)

    collector_task = asyncio.create_task(collector())
    worker = threading.Thread(target=run_inference, daemon=True)
    worker.start()
    try:
        while True:
            try:
                result = await asyncio.wait_for(result_queue.get(), timeout=0.1)
                yield result
            except asyncio.TimeoutError:
                if inference_done.is_set() and result_queue.empty():
                    break
    finally:
        if not collector_task.done():
            collector_task.cancel()
            try:
                await collector_task
            except asyncio.CancelledError:
                pass


# ---------------- app factory ----------------


def create_app(model=None, serve_ui: bool = True):
    if not HAS_AIOHTTP:
        raise RuntimeError("aiohttp is required for the server")
    app = web.Application(client_max_size=512 * 1024 * 1024)
    app["model"] = model
    app.router.add_get("/", handle_root)
    app.router.add_get("/health", handle_health)
    app.router.add_post("/diarization/infer", handle_infer)
    app.router.add_get("/diarization/stream", handle_stream)
    if serve_ui:
        from .webui import handle_ui

        app.router.add_get("/target-diarization", handle_ui)
    return app


def run_server(host: str = "0.0.0.0", port: int = 8000, config=None):
    model = build_model(config)
    if os.environ.get("TD_WARMUP", "1") == "1":
        from ..runtime.compile_cache import warmup_pipeline

        logger.info("precompiling hot paths (TD_WARMUP=0 to skip)...")
        warmup_pipeline(model)
    app = create_app(model)
    logger.info(f"Target Diarization API on {host}:{port}")
    web.run_app(app, host=host, port=port)


if __name__ == "__main__":
    run_server()
