"""The streaming no-recompile invariant (BASELINE.md design point):
after warmup, processing more fixed-size chunks must not trigger any new
XLA compilation in any engine."""

import numpy as np
import pytest

from targetdiarization_tpu.models.speaker import SpeakerEngine
from targetdiarization_tpu.models.vad import VADEngine


def cache_size(jitted) -> int:
    return jitted._cache_size()


class TestNoRecompile:
    def test_vad_fixed_chunks_compile_once(self, rng):
        eng = VADEngine(seed=0)
        chunk = rng.standard_normal(16000).astype(np.float32)
        eng.frame_probs(chunk)  # warmup
        before = cache_size(eng._probs)
        for _ in range(5):
            eng.frame_probs(rng.standard_normal(16000).astype(np.float32))
        assert cache_size(eng._probs) == before

    def test_vad_bucket_ladder_bounded_compiles(self, rng):
        """Arbitrary lengths only ever hit ladder rungs: at most one
        compile per rung, never one per length."""
        eng = VADEngine(seed=0)
        lengths = [7000, 9000, 15000, 17000, 23000, 31000, 33000]
        for n in lengths:
            eng.frame_probs(rng.standard_normal(n).astype(np.float32))
        # 7k,9k,15k → 16k? no: rungs are 1,2,4,8,16,30 s; these lengths
        # map to buckets {16000, 32000, 64000} → ≤3 compiles
        assert cache_size(eng._probs) <= 3

    def test_speaker_bucket_reuse(self, rng):
        eng = SpeakerEngine(model_name="eres2net", seed=0)
        a = rng.standard_normal(12000).astype(np.float32)
        eng.embed_batch([a])
        before = cache_size(eng._embed)
        # same bucket, different lengths and batch content
        eng.embed_batch([rng.standard_normal(15000).astype(np.float32)])
        eng.embed_batch([rng.standard_normal(9000).astype(np.float32)])
        assert cache_size(eng._embed) == before

    def test_streaming_loop_compiles_bounded(self, rng):
        """A full streaming session over many 1 s chunks leaves every
        engine's jit cache at its warmed size."""
        from targetdiarization_tpu.pipeline.streaming import (
            StreamState,
            TargetDiarizationStream,
        )
        from targetdiarization_tpu.pipeline.target_asr import TargetASR
        from targetdiarization_tpu.processors.asr import ASRProcessor
        from targetdiarization_tpu.processors.audio import AudioProcessor

        asrp = ASRProcessor()
        tasr = TargetASR(audio_processor=AudioProcessor(), asr_processor=asrp,
                         speaker_engine=SpeakerEngine(model_name="eres2net"))
        model = TargetDiarizationStream(target_asr=tasr)

        def run_session():
            state = StreamState()
            for _ in range(8):
                chunk = rng.standard_normal(16000).astype(np.float32) * 0.1
                list(model.process_vad_chunk(chunk, False, state))

        run_session()  # warmup session: buffer growth visits ladder rungs
        sizes = (cache_size(asrp.vad._probs), cache_size(tasr.spk._embed))
        # bounded by the ladder (6 rungs), never per-chunk
        assert sizes[0] <= 7 and sizes[1] <= 7
        run_session()  # a second session must add ZERO new compiles
        assert (cache_size(asrp.vad._probs),
                cache_size(tasr.spk._embed)) == sizes
