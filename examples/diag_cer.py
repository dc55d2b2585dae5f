"""Per-stage CER diagnosis (VERDICT r2 next-round item 1).

The engine scores CER 0.063 on clean synthetic eval; the full pipeline
scores ~0.40 on the same language. This script isolates which stage
forfeits the accuracy by transcribing the SAME held-out utterances
through progressively more of the pipeline:

  A. engine direct on clean audio          (recipe eval path)
  B. engine on loudness-normalized audio
  C. engine on host audio_preprocess()     (loudness+denoise+loudness)
  D. engine on fused analyze() output      (device preprocess + i16)
  E. FusedASR masked path, clean audio, full-range mask
  F. FusedASR masked path, VAD-derived ranges on preprocessed audio
  G. full pipeline infer(is_single=True)

Run:  JAX_PLATFORMS=cpu python examples/diag_cer.py [n_utts]
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main(n=8):
    import jax.numpy as jnp

    from targetdiarization_tpu.serve.server import build_model
    from targetdiarization_tpu.train.synth import (cer, random_text,
                                                   synth_utterance)

    model = build_model()
    eng = model.tasr.asrp.asr
    fasr = model.fused_asr
    fused = model.fused

    gen = np.random.default_rng(20260817)
    stages = {k: [] for k in "ABCDEFG"}
    for i in range(n):
        text = random_text(gen, 4, 10)
        audio, _ = synth_utterance(text, gen)
        audio = np.asarray(audio, np.float32)
        dur = len(audio) / 16000.0

        # A: engine direct
        hyp = eng.asr_detection(audio)[0]["text"]
        stages["A"].append(cer(text, hyp))

        # B: loudness only
        la = model.ap.audio_loudness_control(audio, 16000)
        hyp = eng.asr_detection(la)[0]["text"]
        stages["B"].append(cer(text, hyp))

        # C: host preprocess
        pa, _ = model.audio_preprocess(audio.copy(), 16000)
        hyp = eng.asr_detection(pa)[0]["text"]
        stages["C"].append(cer(text, hyp))

        # D: fused preprocess output
        fr = fused.analyze(audio)
        hyp = eng.asr_detection(fr["audio"])[0]["text"]
        stages["D"].append(cer(text, hyp))

        # E: FusedASR, clean audio, full-range mask
        a_i16 = jnp.asarray(
            np.clip(audio * 32768, -32768, 32767).astype(np.int16))
        res = fasr.transcribe_masked(a_i16, len(audio), [[(0.0, dur)]])
        stages["E"].append(cer(text, res[0]["text"]))

        # F: FusedASR on preprocessed audio with VAD ranges
        from targetdiarization_tpu.models.vad import VADConfig, segment_probs
        speech = segment_probs(np.asarray(fr["vad_probs"]), VADConfig())
        if fr.get("audio_dev_i16") is not None and speech:
            res = fasr.transcribe_masked(
                fr["audio_dev_i16"], fr["n_samples"], [list(speech)])
            stages["F"].append(cer(text, res[0]["text"]))
        else:
            stages["F"].append(np.nan)

        # G: full pipeline
        _, results, _ = model.infer(audio, is_single=True,
                                    output_target_audio=False)
        hyp = "".join(r["text"] for r in results)
        hyp = "".join(c for c in hyp if c not in "，。？、！ ")
        stages["G"].append(cer(text, hyp))
        print(f"utt {i}: " + " ".join(
            f"{k}={stages[k][-1]:.2f}" for k in "ABCDEFG"), flush=True)

    names = {"A": "engine/clean", "B": "+loudness", "C": "+host preprocess",
             "D": "+fused preprocess", "E": "fusedASR/clean/full-mask",
             "F": "fusedASR/preproc/VAD-ranges", "G": "full pipeline"}
    print("\n=== mean CER per stage ===")
    for k in "ABCDEFG":
        v = [x for x in stages[k] if np.isfinite(x)]
        print(f"{k} {names[k]:30s} {np.mean(v):.3f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
