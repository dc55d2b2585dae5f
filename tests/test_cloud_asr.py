"""Tencent Flash ASR client: request/sign/parse against a mock transport
(reference cloud path ASRProcessor.py:529-590; no egress here)."""

import base64
import hashlib
import hmac
import json
from urllib.parse import parse_qs, urlparse

import numpy as np
import pytest

from targetdiarization_tpu.processors.cloud_asr import (
    TencentFlashASR, format_hotwords, wav_bytes)

CREDS = dict(appid="1300000000", secret_id="AKIDtest", secret_key="sk-test")


def make_client(transport=None):
    return TencentFlashASR(**CREDS, transport=transport,
                           clock=lambda: 1_700_000_000,
                           rng=lambda: 424242)


class TestSigning:
    def test_canonical_query_is_sorted(self):
        c = make_client()
        params = c.build_params()
        qs = c.canonical_query(params)
        keys = [p.split("=")[0] for p in qs.split("&")]
        assert keys == sorted(keys)

    def test_signature_is_hmac_sha1_of_source(self):
        c = make_client()
        params = c.build_params(engine_type="16k_en")
        source = ("POST" + c.HOST + f"/asr/flash/v1/{CREDS['appid']}?"
                  + c.canonical_query(params))
        want = base64.b64encode(hmac.new(
            CREDS["secret_key"].encode(), source.encode(),
            hashlib.sha1).digest()).decode()
        assert c.sign(params) == want

    def test_request_is_deterministic_given_clock(self):
        a = make_client().build_request(b"abc")
        b = make_client().build_request(b"abc")
        assert a == b


class TestEndToEnd:
    def test_recognize_roundtrip_via_mock_transport(self):
        seen = {}

        def mock_transport(method, url, headers, body):
            seen.update(method=method, url=url, headers=headers, body=body)
            # verify the signature server-side like Tencent would:
            u = urlparse(url)
            q = {k: v[0] for k, v in parse_qs(u.query).items()}
            src = ("POST" + u.netloc + u.path + "?"
                   + "&".join(f"{k}={q[k]}" for k in sorted(q)))
            want = base64.b64encode(hmac.new(
                CREDS["secret_key"].encode(), src.encode(),
                hashlib.sha1).digest()).decode()
            assert headers["Authorization"] == want, "signature mismatch"
            resp = {
                "code": 0, "message": "success",
                "flash_result": [{
                    "text": "你好世界",
                    "sentence_list": [
                        {"text": "你好", "start_time": 0, "end_time": 800},
                        {"text": "世界", "start_time": 900, "end_time": 1700},
                    ],
                }],
            }
            return 200, json.dumps(resp).encode()

        c = make_client(mock_transport)
        out = c.recognize(b"\x00\x01" * 100, hotword_list="词|11")
        assert out["text"] == "你好世界"
        assert out["sentences"][1]["end_ms"] == 1700
        assert seen["method"] == "POST"
        assert seen["body"] == b"\x00\x01" * 100
        q = {k: v[0] for k, v in
             parse_qs(urlparse(seen["url"]).query).items()}
        assert q["engine_type"] == "16k_zh"
        assert q["hotword_list"] == "词|11"
        assert q["secretid"] == CREDS["secret_id"]

    def test_service_error_raises(self):
        def err_transport(method, url, headers, body):
            return 200, json.dumps({"code": 4001, "message": "bad"}).encode()

        with pytest.raises(RuntimeError, match="4001"):
            make_client(err_transport).recognize(b"x")

    def test_processor_integration(self, tmp_path):
        """ASRProcessor.asr_detection_api drives the real client through
        the mock transport and returns the reference result contract."""
        from targetdiarization_tpu.processors.asr import ASRProcessor

        cfg = tmp_path / "config.json"
        cfg.write_text(json.dumps({"tencent": CREDS}))
        asrp = ASRProcessor(config_file=str(cfg))

        def mock_transport(method, url, headers, body):
            # body must be a parseable WAV container
            import io
            import wave

            with wave.open(io.BytesIO(body)) as w:
                assert w.getframerate() == 16000
                assert w.getnchannels() == 1
            resp = {"code": 0, "flash_result": [{
                "text": "测试文本",
                "sentence_list": [{"text": "测试文本", "start_time": 0,
                                   "end_time": 1000}]}]}
            return 200, json.dumps(resp).encode()

        audio = np.zeros(16000, np.float32)
        res = asrp.asr_detection_api(audio, 16000, "tencent",
                                     transport=mock_transport)
        assert res[0]["text"] == "测试文本"
        assert res[0]["timestamp"] == [[0, 1000]]

    def test_missing_credentials_fail_soft(self):
        from targetdiarization_tpu.processors.asr import ASRProcessor

        asrp = ASRProcessor(config_file="/nonexistent.json")
        res = asrp.asr_detection_api(np.zeros(160), 16000, "tencent")
        assert res[0]["text"] == "" and "error" in res[0]


class TestHelpers:
    def test_format_hotwords(self):
        assert format_hotwords("a, b,c") == "a|11,b|11,c|11"
        assert format_hotwords("a|5,b|11") == "a|5,b|11"
        assert format_hotwords("") == ""

    def test_wav_bytes_roundtrip(self):
        import io
        import wave

        x = (np.sin(np.linspace(0, 100, 1600)) * 0.5).astype(np.float32)
        raw = wav_bytes(x, 16000)
        with wave.open(io.BytesIO(raw)) as w:
            assert w.getnframes() == 1600
            got = np.frombuffer(w.readframes(1600), np.int16)
        np.testing.assert_allclose(got / 32768.0, x, atol=1e-4)
