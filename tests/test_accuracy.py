"""Pipeline-level accuracy regression (VERDICT.md round-1 item 6).

Ground truth: the REFERENCE system's own output on the checked-in
fixture pair (chat_mix.wav + female_a.wav), transcribed from its demo
recording (assets/webui_demo.mp4 shows the full speaker-log JSON for
exactly this input) — see tests/fixtures/chat_mix_reference.json.

Two guards:
- DER of the full `infer` against the reference diarization stays under
  a recorded ceiling (bootstrap-checkpoint quality; tighten as the
  shipped checkpoints improve).
- A golden snapshot of the current output (segment count, speakers,
  boundaries) so any silent behavior change fails CI. Regenerate
  deliberately with TD_REGEN_GOLDEN=1 after a model upgrade.
"""

import json
import os
import pathlib

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
FIXTURES = pathlib.Path(__file__).resolve().parent / "fixtures"
REFERENCE_JSON = FIXTURES / "chat_mix_reference.json"
GOLDEN_JSON = FIXTURES / "chat_mix_golden.json"

# Ceiling for the shipped bootstrap checkpoints. Round-4 measured DER
# 0.000 (collar 0.25; 0.029 with no collar) after the Binarize rewrite
# to true pyannote semantics: segments end at the first sub-offset
# frame and min_duration_off merges gaps only between onset-confirmed
# segments, which closes mid-utterance confidence dips without bridging
# true segment ends (models/diarization.py::activations_to_diarization).
# History: 0.43 → 0.166 (round 2) → 0.020 (round 3) → 0.000 (round 4).
DER_CEILING = 0.03
# No-collar ceiling (VERDICT r4 ask 6): the collar hides ~30 ms-scale
# boundary error, and the no-collar number is the one that moves if
# segmentation regresses. Round-5 measured 0.0176 after (a) onset
# back-extension, (b) VAD-evidence edge snapping in offline.py
# (_segmentation_sd), (c) asymmetric pad_onset/pad_offset calibration —
# history 0.029 → 0.0260 → 0.0243 → 0.0210 → 0.0176.
DER_CEILING_NO_COLLAR = 0.02


@pytest.fixture(scope="module")
def served_output():
    needed = ["vad-bootstrap", "spk-bootstrap", "seg-bootstrap"]
    if not all((REPO / "checkpoints" / n).exists() for n in needed):
        pytest.skip("bootstrap checkpoints not present")
    from targetdiarization_tpu.serve.server import build_model

    model = build_model()
    target_spk, results, target_audio = model.infer(
        str(REPO.parent / "reference" / "assets" / "chat_mix.wav")
        if not os.path.exists("/root/reference/assets/chat_mix.wav")
        else "/root/reference/assets/chat_mix.wav",
        target_file="/root/reference/assets/female_a.wav",
        output_target_audio=True)
    return {"target_spk": target_spk, "results": results,
            "target_audio": target_audio}


def _to_ranges(results):
    out = {}
    for r in results:
        out.setdefault(r["speaker"], []).append(tuple(r["timerange"]))
    return out


class TestDiarizationAccuracy:
    def test_der_vs_reference_under_ceiling(self, served_output):
        from targetdiarization_tpu.train.eval_metrics import der

        gt = json.loads(REFERENCE_JSON.read_text())
        ref = _to_ranges(gt["results"])
        hyp = _to_ranges(served_output["results"])
        d = der(ref, hyp)
        assert d <= DER_CEILING, f"DER {d:.3f} > ceiling {DER_CEILING}"

    def test_der_no_collar_under_ceiling(self, served_output):
        from targetdiarization_tpu.train.eval_metrics import der

        gt = json.loads(REFERENCE_JSON.read_text())
        ref = _to_ranges(gt["results"])
        hyp = _to_ranges(served_output["results"])
        d = der(ref, hyp, collar=0.0)
        assert d <= DER_CEILING_NO_COLLAR, (
            f"no-collar DER {d:.3f} > ceiling {DER_CEILING_NO_COLLAR}")

    def test_speech_coverage(self, served_output):
        """Hypothesis must cover most of the reference speech span and
        not hallucinate speech far outside it."""
        hyp = [r["timerange"] for r in served_output["results"]]
        assert hyp, "no segments produced"
        lo = min(s for s, _ in hyp)
        hi = max(e for _, e in hyp)
        assert lo <= 0.5, f"first speech starts too late: {lo}"
        assert hi >= 8.0, f"speech ends too early: {hi}"
        assert hi <= 8.67, f"speech past end of audio: {hi}"

    def test_target_audio_produced(self, served_output):
        audio = served_output["target_audio"]
        assert audio is not None and audio.size > 16000
        assert np.isfinite(audio).all()


class TestGoldenSnapshot:
    def test_output_matches_golden(self, served_output):
        snap = {
            "target_spk": served_output["target_spk"],
            "segments": [
                {"speaker": r["speaker"],
                 "timerange": [round(float(r["timerange"][0]), 2),
                               round(float(r["timerange"][1]), 2)],
                 "type": r["type"]}
                for r in served_output["results"]
            ],
        }
        if os.environ.get("TD_REGEN_GOLDEN") == "1" or not GOLDEN_JSON.exists():
            GOLDEN_JSON.write_text(
                json.dumps(snap, ensure_ascii=False, indent=1))
            pytest.skip("golden snapshot (re)generated")
        golden = json.loads(GOLDEN_JSON.read_text())
        assert snap["target_spk"] == golden["target_spk"]
        assert len(snap["segments"]) == len(golden["segments"]), (
            f"segment count changed: {snap} vs {golden}")
        for got, want in zip(snap["segments"], golden["segments"]):
            assert got["speaker"] == want["speaker"]
            assert got["type"] == want["type"]
            assert abs(got["timerange"][0] - want["timerange"][0]) <= 0.08  # 2 seg frames
            assert abs(got["timerange"][1] - want["timerange"][1]) <= 0.08


class TestPipelineCER:
    """End-to-end transcription accuracy on the synthetic language the
    shipped asr-bootstrap was trained for (held-out utterances)."""

    def test_single_speaker_cer(self):
        if not (REPO / "checkpoints" / "asr-bootstrap").exists():
            pytest.skip("asr-bootstrap not present")
        from targetdiarization_tpu.serve.server import build_model
        from targetdiarization_tpu.train.synth import (
            cer, random_text, synth_utterance)

        model = build_model()
        gen = np.random.default_rng(20260817)
        cers = []
        for _ in range(5):
            text = random_text(gen, 4, 10)
            audio, _ = synth_utterance(text, gen)
            _, results, _ = model.infer(audio, is_single=True,
                                        output_target_audio=False)
            hyp = "".join(r["text"] for r in results)
            hyp = "".join(c for c in hyp if c not in "，。？、！ ")
            cers.append(cer(text, hyp))
        mean_cer = float(np.mean(cers))
        # Round-3 history: 0.40 → 0.044 (CIF tail fix + boundary pad)
        # → 0.033 (edge snap) → 0.000 (single-speaker mode feeds the
        # whole clip to ASR like the reference's single_speaker_asr,
        # instead of slicing by the segmentation net). Ceiling leaves
        # headroom for one boundary slip on the 5-utterance CI sample.
        assert mean_cer < 0.05, f"pipeline CER {mean_cer}: {cers}"
