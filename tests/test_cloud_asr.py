"""Cloud ASR clients (tencent/gemini/jzx/xunfei): request/sign/parse
against mock transports (reference cloud path ASRProcessor.py:529-739;
no egress here)."""

import base64
import hashlib
import hmac
import json
from urllib.parse import parse_qs, urlparse

import numpy as np
import pytest

from targetdiarization_tpu.processors.cloud_asr import (
    GeminiASR, JzxASR, TencentFlashASR, XunfeiIatASR, format_hotwords,
    wav_bytes)

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


class TestGemini:
    def test_request_carries_prompt_config_and_inline_audio(self):
        c = GeminiASR(api_key="gk-test")
        url, headers, body = c.build_request(b"RIFFdata", "audio/wav",
                                             "unknown", "zh-CN")
        assert url.endswith("models/gemini-2.5-flash:generateContent")
        assert headers["x-goog-api-key"] == "gk-test"
        payload = json.loads(body)
        parts = payload["contents"][0]["parts"]
        assert "Transcribe the attached audio" in parts[0]["text"]
        assert "MUST automatically detect" in parts[0]["text"]
        assert base64.b64decode(parts[1]["inline_data"]["data"]) == b"RIFFdata"
        assert parts[1]["inline_data"]["mime_type"] == "audio/wav"
        gc = payload["generationConfig"]
        assert gc["temperature"] == 0.0
        assert gc["thinkingConfig"]["thinkingBudget"] == 0

    def test_known_language_prompt(self):
        p = GeminiASR.build_prompt("en-US", "en-US")
        assert "The language spoken in the audio is `en-US`." in p

    def test_base_url_override(self):
        c = GeminiASR(api_key="k", base_url="https://proxy.example/")
        url, _, _ = c.build_request(b"x")
        assert url.startswith("https://proxy.example/v1beta/")

    def test_roundtrip_and_strip(self):
        def mock_transport(method, url, headers, body):
            assert method == "POST"
            resp = {"candidates": [{"content": {"parts": [
                {"text": "  你好 世界\n"}]}}]}
            return 200, json.dumps(resp).encode()

        c = GeminiASR(api_key="k", transport=mock_transport)
        assert c.get_result(b"audio") == "你好 世界"

    def test_empty_candidates_and_error(self):
        assert GeminiASR.parse_response(b'{"candidates": []}') == ""
        assert GeminiASR.parse_response(
            b'{"candidates": [{"content": {}}]}') == ""
        with pytest.raises(RuntimeError, match="429"):
            GeminiASR.parse_response(
                b'{"error": {"code": 429, "message": "quota"}}')

    def test_processor_integration(self, tmp_path):
        from targetdiarization_tpu.processors.asr import ASRProcessor

        cfg = tmp_path / "config.json"
        cfg.write_text(json.dumps({"gemini": {"api_key": "gk"}}))
        asrp = ASRProcessor(config_file=str(cfg))

        def mock_transport(method, url, headers, body):
            payload = json.loads(body)
            # audio part must be a valid WAV container
            import io
            import wave

            wav = base64.b64decode(
                payload["contents"][0]["parts"][1]["inline_data"]["data"])
            with wave.open(io.BytesIO(wav)) as w:
                assert w.getframerate() == 16000
            resp = {"candidates": [{"content": {"parts": [
                {"text": "云端转写"}]}}]}
            return 200, json.dumps(resp).encode()

        res = asrp.asr_detection_api(np.zeros(16000, np.float32), 16000,
                                     "gemini", transport=mock_transport)
        assert res[0]["text"] == "云端转写"


class TestJzx:
    def test_request_shape(self):
        c = JzxASR(endpoint="https://jzx.example/asr")
        url, headers, body = c.build_request(b"\x01\x02", context="hint")
        assert url == "https://jzx.example/asr"
        payload = json.loads(body)
        assert payload["source_type"] == 2
        assert base64.b64decode(payload["data"]) == b"\x01\x02"
        assert payload["context"] == "hint"
        assert payload["enable_word_timestamps"] is True

    def test_roundtrip_with_word_timestamps(self):
        def mock_transport(method, url, headers, body):
            resp = {"code": 0, "data": {
                "text": "词级时间",
                "word_list": [
                    {"word": "词级", "start": 0.0, "end": 0.5},
                    {"word": "时间", "start": 0.5, "end": 1.0},
                ]}}
            return 200, json.dumps(resp).encode()

        c = JzxASR("https://e", transport=mock_transport)
        out = c.recognize(b"pcm")
        assert out["text"] == "词级时间"
        assert out["words"][1] == ("时间", [0.5, 1.0])

    def test_error_code_raises(self):
        def err(method, url, headers, body):
            return 200, json.dumps({"code": 7, "message": "bad"}).encode()

        with pytest.raises(RuntimeError, match="jzx error 7"):
            JzxASR("https://e", transport=err).recognize(b"x")

    def test_processor_integration(self, tmp_path):
        from targetdiarization_tpu.processors.asr import ASRProcessor

        cfg = tmp_path / "config.json"
        cfg.write_text(json.dumps({"jzx": {"endpoint": "https://j/asr"}}))
        asrp = ASRProcessor(config_file=str(cfg))

        def mock_transport(method, url, headers, body):
            resp = {"code": 0, "data": {"text": "abc", "word_list": [
                {"word": "abc", "start": 0.1, "end": 0.9}]}}
            return 200, json.dumps(resp).encode()

        res = asrp.asr_detection_api(np.zeros(1600, np.float32), 16000,
                                     "jzx", transport=mock_transport)
        assert res[0]["text"] == "abc"
        assert res[0]["timestamp"] == [("abc", [0.1, 0.9])]


class TestXunfei:
    CREDS = dict(appid="app1", api_key="xk", api_secret="xs")

    def make(self, transport=None):
        return XunfeiIatASR(**self.CREDS, transport=transport,
                            clock=lambda: 1_700_000_000.0)

    def test_auth_url_signature(self):
        c = self.make()
        url = c.build_url()
        q = {k: v[0] for k, v in parse_qs(urlparse(url).query).items()}
        origin = base64.b64decode(q["authorization"]).decode()
        assert 'api_key="xk"' in origin
        assert 'algorithm="hmac-sha256"' in origin
        # verify the signature server-side like xfyun would
        sig = origin.split('signature="')[1].rstrip('"')
        src = (f"host: {c.HOST}\ndate: {q['date']}\n"
               f"GET {c.PATH} HTTP/1.1")
        want = base64.b64encode(hmac.new(
            b"xs", src.encode(), hashlib.sha256).digest()).decode()
        assert sig == want

    def test_frame_statuses_and_config(self):
        c = self.make()
        pcm = b"\x00" * (c.FRAME_SIZE * 2 + 100)  # 3 frames
        frames = [json.loads(f) for f in c.build_frames(pcm)]
        assert [f["data"]["status"] for f in frames] == [0, 1, 2]
        assert frames[0]["common"]["app_id"] == "app1"
        assert frames[0]["business"]["domain"] == "iat"
        assert "common" not in frames[1]
        joined = b"".join(base64.b64decode(f["data"]["audio"])
                          for f in frames)
        assert joined == pcm

    def test_single_frame_is_final(self):
        frames = [json.loads(f) for f in self.make().build_frames(b"x")]
        assert len(frames) == 1 and frames[0]["data"]["status"] == 2

    def test_parse_with_dynamic_correction(self):
        msgs = [
            json.dumps({"code": 0, "data": {"result": {
                "sn": 1, "ws": [{"cw": [{"w": "你号"}]}]}}}),
            json.dumps({"code": 0, "data": {"result": {
                "sn": 2, "pgs": "rpl", "rg": [1, 1],
                "ws": [{"cw": [{"w": "你好"}]}]}}}),
            json.dumps({"code": 0, "data": {"result": {
                "sn": 3, "ws": [{"cw": [{"w": "世界"}]}]}}}),
        ]
        assert XunfeiIatASR.parse_messages(msgs) == "你好世界"

    def test_error_code_raises(self):
        with pytest.raises(RuntimeError, match="xunfei error 10165"):
            XunfeiIatASR.parse_messages(
                [json.dumps({"code": 10165, "message": "invalid handle"})])

    def test_end_to_end_via_mock_ws(self):
        seen = {}

        def ws_transport(url, frames):
            seen["url"] = url
            seen["frames"] = [json.loads(f) for f in frames]
            return [json.dumps({"code": 0, "data": {"result": {
                "sn": 1, "ws": [{"cw": [{"w": "流式"}]}]}}})]

        c = self.make(ws_transport)
        out = c.get_result(b"\x00\x01" * 2000, hotword="hw1")
        assert out == "流式"
        assert seen["url"].startswith("wss://iat-api.xfyun.cn/v2/iat?")
        assert seen["frames"][0]["business"]["hotword_id"] == "hw1"

    def test_no_transport_fails_soft_in_processor(self, tmp_path):
        from targetdiarization_tpu.processors.asr import ASRProcessor

        cfg = tmp_path / "config.json"
        cfg.write_text(json.dumps({"xunfei": self.CREDS}))
        asrp = ASRProcessor(config_file=str(cfg))
        res = asrp.asr_detection_api(np.zeros(160, np.float32), 16000,
                                     "xunfei")
        assert res[0]["text"] == "" and "transport" in res[0]["error"]


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
