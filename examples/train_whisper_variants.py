#!/usr/bin/env python
"""Train the three real Whisper engine variants the reference ships
(/root/reference/ASRProcessor.py:229-252):

  whisper_v2       → checkpoints/whisper-v2       (compact geometry)
  whisper_v3       → checkpoints/whisper-v3       (large; also bare "whisper")
  whisper_finetune → checkpoints/whisper-finetune (v3 geometry, fine-tuned
                     with the pipeline's preprocess-chain augmentation)

Run order is v3 → finetune (init_from v3) → v2; each variant's held-out
metrics land in <checkpoint_dir>/metrics.json for the README table and
the per-variant regression tests.

Usage:  python examples/train_whisper_variants.py [v3|v2|finetune|all]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from targetdiarization_tpu.train.recipes import bootstrap_whisper  # noqa: E402


def _save_metrics(metrics: dict) -> None:
    path = os.path.join(metrics["checkpoint"], "metrics.json")
    with open(path, "w") as f:
        json.dump(metrics, f, indent=1)
    print(f"metrics -> {path}", flush=True)


def train_v3() -> dict:
    # Larger variant in the CONVERGING regime: 128/3+2 with ffn 640 and
    # a longer run than v2. Scaling width (256) or depth (6+3) failed
    # every round-5 curriculum on this synthetic task: a larger model
    # locks phase-1 alignment only by memorizing the finite corpus
    # verbatim (corpus CE ~1.27, fresh CE at the 3.0 unigram prior),
    # and ANY fresh-batch phase then collapses it — through a blended
    # ramp, from either the device renderer or the host synthesizer;
    # per-draw noise augmentation prevents the memorization but then
    # alignment never locks at all (CE 2.4 at 9k steps). The 128/3+2
    # geometry both locks AND generalizes (v2: phase-2 fresh CE 0.007),
    # so v3 adds capacity where it is safe (ffn) and trains longer.
    # exit gate 0.5 (not the default 1.5): v2 exited phase 1 at corpus
    # CE ~0.36 and generalized instantly; a seed-7 ffn-640 run exited
    # at 1.08 and crawled at fresh CE 2.2+ — ramping before the corpus
    # is deeply converged strands the model
    m = bootstrap_whisper(
        steps=15000, batch=16, phase1_steps=4000, device_synth=True,
        phase1_exit_loss=0.5,
        dim=128, enc_layers=3, dec_layers=2, ffn=640, peak_lr=1e-3,
        eval_utts=60, checkpoint_dir="checkpoints/whisper-v3", seed=2)
    _save_metrics(m)
    return m


def train_finetune() -> dict:
    # v3 geometry, initialised from the trained v3, fine-tuned with 25%
    # of every fresh batch routed through the pipeline's exact
    # preprocess chain (loudness → MDX denoise → loudness → int16).
    m = bootstrap_whisper(
        steps=4000, batch=16, phase1_steps=0, device_synth=True,
        dim=128, enc_layers=3, dec_layers=2, ffn=640, peak_lr=2e-4,
        init_from="checkpoints/whisper-v3", aug_frac=0.25,
        eval_utts=60, checkpoint_dir="checkpoints/whisper-finetune",
        seed=1)
    _save_metrics(m)
    return m


def train_v2() -> dict:
    # Compact variant at the round-3 bootstrap geometry, retrained with
    # the loss-gated curriculum and longer phase 2.
    m = bootstrap_whisper(
        steps=14000, batch=16, phase1_steps=4000, device_synth=True,
        dim=128, enc_layers=3, dec_layers=2, ffn=512, peak_lr=1e-3,
        eval_utts=60, checkpoint_dir="checkpoints/whisper-v2", seed=2)
    _save_metrics(m)
    return m


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    jobs = {"v3": [train_v3], "finetune": [train_finetune],
            "v2": [train_v2],
            "all": [train_v3, train_finetune, train_v2]}[which]
    for job in jobs:
        t0 = time.time()
        print(f"=== {job.__name__} ===", flush=True)
        m = job()
        print(f"=== {job.__name__} done in {time.time() - t0:.0f}s: "
              f"cer={m['eval_cer']:.4f} exact={m['eval_exact']:.2f} ===",
              flush=True)
