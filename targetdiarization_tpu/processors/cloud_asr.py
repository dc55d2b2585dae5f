"""Cloud ASR clients with injectable transports.

The reference drives four hosted ASR services through vendor SDKs
(ASRProcessor.py:529-739: tencent flash recognizer, xunfei, gemini,
jzx). This module implements the Tencent Flash Recognition wire protocol
NATIVELY — URL construction, parameter canonicalization, HMAC-SHA1
request signing, and response parsing — with the HTTP transport as an
injectable callable, so the full request/sign/parse path is exercised
against a mock transport in tests (network egress is unavailable in this
environment; with credentials + a real network the default urllib
transport goes live unchanged).

Protocol (Tencent "flash" one-shot ASR):
    POST https://asr.cloud.tencent.com/asr/flash/v1/<appid>?<sorted qs>
    Authorization: base64(HMAC-SHA1(secret_key,
        "POST" + host + path + "?" + sorted_qs))
    body: raw audio bytes
    response: {"code": 0, "flash_result": [{"text": ...}], ...}
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import random
import time
from urllib.parse import quote


def urllib_transport(method: str, url: str, headers: dict, body: bytes):
    """Default live transport: (status_code, response_bytes)."""
    import urllib.request

    req = urllib.request.Request(url, data=body, headers=headers,
                                 method=method)
    with urllib.request.urlopen(req, timeout=30) as resp:
        return resp.status, resp.read()


class TencentFlashASR:
    """Native client for Tencent Cloud Flash Recognition (the engine
    behind the reference's `tencent` path, ASRProcessor.py:540-590)."""

    HOST = "asr.cloud.tencent.com"

    def __init__(self, appid: str, secret_id: str, secret_key: str,
                 transport=None, clock=None, rng=None):
        self.appid = str(appid)
        self.secret_id = secret_id
        self.secret_key = secret_key
        self.transport = transport or urllib_transport
        self._clock = clock or (lambda: int(time.time()))
        self._rng = rng or (lambda: random.randint(0, 10**10))

    # -------- request construction (pure, tested) --------

    def build_params(self, engine_type: str = "16k_zh",
                     voice_format: str = "wav", hotword_list: str = "",
                     word_info: int = 0) -> dict:
        now = self._clock()
        params = {
            "secretid": self.secret_id,
            "engine_type": engine_type,
            "voice_format": voice_format,
            "timestamp": str(now),
            "expired": str(now + 24 * 3600),
            "nonce": str(self._rng()),
            "word_info": str(word_info),
        }
        if hotword_list:
            params["hotword_list"] = hotword_list
        return params

    def canonical_query(self, params: dict) -> str:
        """Key-sorted query string — the exact string that gets signed
        (values are NOT url-encoded in the signature source, per the
        flash-recognizer signing scheme; encoding happens only in the
        request URL)."""
        return "&".join(f"{k}={params[k]}" for k in sorted(params))

    def sign(self, params: dict) -> str:
        source = ("POST" + self.HOST + f"/asr/flash/v1/{self.appid}?"
                  + self.canonical_query(params))
        digest = hmac.new(self.secret_key.encode("utf-8"),
                          source.encode("utf-8"), hashlib.sha1).digest()
        return base64.b64encode(digest).decode("ascii")

    def build_request(self, audio_bytes: bytes, engine_type: str = "16k_zh",
                      voice_format: str = "wav", hotword_list: str = ""):
        """→ (url, headers, body). Deterministic given clock/rng."""
        params = self.build_params(engine_type, voice_format, hotword_list)
        signature = self.sign(params)
        encoded = "&".join(
            f"{k}={quote(str(params[k]), safe='')}" for k in sorted(params))
        url = f"https://{self.HOST}/asr/flash/v1/{self.appid}?{encoded}"
        headers = {
            "Authorization": signature,
            "Content-Type": "application/octet-stream",
            "Host": self.HOST,
        }
        return url, headers, audio_bytes

    # -------- response parsing (pure, tested) --------

    @staticmethod
    def parse_response(body: bytes) -> dict:
        """→ {'text', 'sentences': [{'text', 'start_ms', 'end_ms'}...]}.
        Raises RuntimeError on a service-side error code."""
        res = json.loads(body.decode("utf-8"))
        if res.get("code", 0) != 0:
            raise RuntimeError(
                f"tencent asr error {res.get('code')}: {res.get('message')}")
        flash = res.get("flash_result") or []
        if not flash:
            return {"text": "", "sentences": []}
        first = flash[0]
        sentences = [
            {
                "text": s.get("text", ""),
                "start_ms": int(s.get("start_time", 0)),
                "end_ms": int(s.get("end_time", 0)),
            }
            for s in first.get("sentence_list") or []
        ]
        return {"text": first.get("text", ""), "sentences": sentences}

    # -------- end-to-end --------

    def recognize(self, audio_bytes: bytes, engine_type: str = "16k_zh",
                  voice_format: str = "wav", hotword_list: str = "") -> dict:
        url, headers, body = self.build_request(
            audio_bytes, engine_type, voice_format, hotword_list)
        status, resp = self.transport("POST", url, headers, body)
        if status != 200:
            raise RuntimeError(f"tencent asr HTTP {status}")
        return self.parse_response(resp)


def format_hotwords(prompt: str) -> str:
    """Reference hotword formatting: 'a, b' → 'a|11,b|11'
    (ASRProcessor.py:564-566)."""
    if not prompt or "|" in prompt:
        return prompt
    return ",".join(f"{w.strip()}|11" for w in prompt.split(","))


def wav_bytes(audio, sr: int) -> bytes:
    """PCM16 WAV container for an ndarray (the upload format)."""
    import io
    import wave

    import numpy as np

    a = np.asarray(audio)
    if a.dtype.kind == "f":
        a = np.clip(a * 32768.0, -32768, 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(a.tobytes())
    return buf.getvalue()
