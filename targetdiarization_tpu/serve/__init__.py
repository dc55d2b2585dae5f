"""Serving layer: REST + WebSocket API and web UI.

    server.py  aiohttp app wire-compatible with the reference's FastAPI
               protocol (main.py): GET /, GET /health,
               POST /diarization/infer, WS /diarization/stream
    webui.py   browser demo UI (upload + URL + mic streaming), replacing
               the reference's Gradio app + demo.html client
"""

from .server import create_app, run_server  # noqa: F401
