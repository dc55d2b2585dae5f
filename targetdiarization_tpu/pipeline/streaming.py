"""TargetDiarizationStream: chunked real-time pipeline (L4 streaming).

TPU-native re-creation of the reference's streaming subclass
(/root/reference/TargetDiarizationStream.py:13): generator-driven loop
with smart VAD buffering, loudness gating, speaker-change flush and
streaming self-enrollment. Differences by design:

- silero-vad is replaced by our FSMN VADEngine everywhere
  (SURVEY.md §2.3 consolidation).
- ALL mutable stream state lives in a per-call `StreamState`, fixing the
  reference's shared-instance race where two concurrent WebSocket
  sessions corrupt each other's `self.vad_buffer`/`current_time`
  (SURVEY.md §5.2 sharp edge).
- every chunk hits pre-compiled fixed-shape programs (1 s chunks →
  one fbank/VAD/embedding bucket each), so after warmup the loop never
  recompiles (BASELINE.md no-recompile invariant).

Flush-rule cascade (reference should_wait_for_next_chunk :110-171):
  R1 buffer ≥ max_buffer_duration → flush
  R2 silence chunk + trailing gap ≥ vad_min_silence → flush
  R3 no speech in chunk → zero-substitute, wait
  R4 speech-complete gap → flush
  R5 speaker change between buffer and chunk → flush
"""

from __future__ import annotations

import io
import os
import re
import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Generator, Union

import numpy as np

from .offline import TargetDiarization


class _FlushQueue:
    """Per-session ordered async flush pipeline.

    Heavy flush work (separation + ASR + embedding over the flushed
    buffer, reference process_single_chunk :174-186) runs on ONE
    background worker per session, so the chunk-intake/flush-decision
    path never blocks on it: a 1 s real-time chunk budget is spent on
    the decision dispatch only, and a flush that takes hundreds of ms
    overlaps the next chunks' intake. FIFO execution on a single worker
    preserves the synchronous semantics exactly (state.current_time
    advances in flush order; self-enrollment happens on the first
    flushed buffer). Across sessions, overlapped flushes coalesce in
    the engines' cross-session MicroBatcher (runtime/microbatch.py), so
    8 concurrent flushes share batched device programs instead of
    queueing serially — the round-3 p90 regression's fix.

    Bounded by `max_inflight`: when full, submit first drains the
    oldest future (back-pressure so a slower-than-real-time flush
    stream cannot queue unboundedly).
    """

    def __init__(self, run, max_inflight: int = 2, on_emit=None):
        self._run = run
        self._ex = ThreadPoolExecutor(max_workers=1)
        self._pending: deque = deque()
        self._max = max(1, int(max_inflight))
        # on_emit(latency_s): called once per flushed result as it is
        # handed back to the caller, with the chunk→result-emission
        # latency — wall time from the arrival of the chunk that
        # triggered the flush to the result being yielded. This is the
        # user-experienced bound the intake-latency percentile can't
        # see: the async queue deliberately moved flush work off the
        # intake path, so intake latency alone is vacuous.
        self._on_emit = on_emit

    def _emit(self, fut, t_arrival) -> list:
        results = fut.result()
        if self._on_emit is not None and t_arrival is not None and results:
            import time

            lat = time.perf_counter() - t_arrival
            for _ in results:
                self._on_emit(lat)
        return results

    def submit(self, audio, t_arrival=None) -> list:
        """Enqueue a flush; returns any results forced out by back-pressure."""
        forced: list = []
        while len(self._pending) >= self._max:
            forced.extend(self._emit(*self._pending.popleft()))
        self._pending.append((self._ex.submit(self._run, audio), t_arrival))
        return forced

    def drain_ready(self):
        """Yield results of completed flushes, preserving FIFO order."""
        while self._pending and self._pending[0][0].done():
            yield from self._emit(*self._pending.popleft())

    def drain_all(self):
        while self._pending:
            yield from self._emit(*self._pending.popleft())

    def close(self):
        self._ex.shutdown(wait=False)


@dataclass
class StreamState:
    """Per-session mutable state (one per infer_stream call)."""

    current_time: float = 0.0
    target_embedding: np.ndarray | None = None
    prev_asr_text: str = ""
    vad_buffer: list = field(default_factory=list)
    buffer_duration: float = 0.0
    system_loudness_diff: float = 0.0
    # optional on_emit(latency_s) metric callback (chunk→result emission)
    on_emit: object = None

    def clear_buffer(self):
        self.vad_buffer.clear()
        self.buffer_duration = 0.0


class TargetDiarizationStream(TargetDiarization):
    def __init__(self, is_vad_buffer: bool = True, use_asr_prompt: bool = False,
                 similarity_threshold: float = 0.4, vad_min_silence: float = 0.3,
                 max_buffer_duration: float = 30.0,
                 loudness_diff_threshold: float = 12.0, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._stream_analyzer = None
        try:
            from .fused import StreamChunkAnalyzer

            if self.tasr.asrp.vad is not None:
                self._stream_analyzer = StreamChunkAnalyzer(
                    self.tasr.asrp.vad, self.tasr.spk)
        except Exception as e:
            self._log(f"stream analyzer unavailable: {e}")
        self.is_vad_buffer = is_vad_buffer
        self.use_asr_prompt = use_asr_prompt
        self.similarity_threshold = similarity_threshold
        self.vad_min_silence = vad_min_silence
        self.max_buffer_duration = max_buffer_duration
        self.loudness_diff_threshold = loudness_diff_threshold
        # async flush: run separation+ASR flush work off the intake path
        # (TD_ASYNC_FLUSH=0 restores the synchronous in-line behavior)
        self.async_flush = os.environ.get("TD_ASYNC_FLUSH", "1") != "0"
        self.max_inflight_flushes = int(
            os.environ.get("TD_MAX_INFLIGHT_FLUSH", "2"))

    # ---------------- warmup ----------------

    def prewarm_streaming(self, max_sessions: int = 8) -> int:
        """Deterministically compile every device program a paced
        multi-session streaming run can reach, so N ≤ max_sessions
        concurrent sessions trigger ZERO XLA compiles (the soak
        invariant, examples/ws_soak.py). A single warmup session cannot
        do this: the cross-session MicroBatcher's coalesced row-rung
        programs (stream analyzer / ASR / separation) only exist under
        concurrency, and which (bucket, rows) combos a live run visits
        depends on flush timing. Returns the number of programs warmed.
        Intended for serve startup; every compile lands in the
        persistent cache, so restarts pay disk loads only."""
        from ..runtime.buckets import BucketLadder
        from .fused import _LADDER

        n = 0
        max_buf = int(self.max_buffer_duration * 16000)
        max_bucket = _LADDER.bucket(min(max_buf, _LADDER.rungs[-1]))

        def rows_of(ladder):
            rungs = ladder.rungs if isinstance(ladder, BucketLadder) else ladder
            return [r for r in rungs if r <= max(max_sessions, 1)]

        # 1) chunk-decision analyzer: (buffer bucket × row rung) grid
        sa = self._stream_analyzer
        if sa is not None:
            cs = sa.CHUNK_LADDER.bucket(16000)  # 1 s design point
            for bucket in _LADDER.rungs:
                if bucket > max_bucket:
                    break
                for nb in rows_of(sa.ROW_LADDER):
                    items = [(np.zeros(min(bucket, 16000), np.float32),
                              np.zeros(16000, np.float32))] * nb
                    sa._run_batch((bucket, cs), items)
                    n += 1
        # 2) flush-path ASR: (sample bucket × row rung)
        asr = getattr(self.tasr.asrp, "asr", None)
        if asr is not None and hasattr(asr, "_run_mb"):
            from ..models.asr import _SAMPLE_LADDER

            for bucket in _SAMPLE_LADDER.rungs:
                if bucket > max(max_bucket, _SAMPLE_LADDER.rungs[0]):
                    break
                for nb in rows_of(asr.ROW_LADDER):
                    items = [(np.zeros(bucket, np.int16), 16000)] * nb
                    asr._run_mb(bucket, items)
                    n += 1
        # 3) speaker embeddings: rows {1, 2} per bucket (R5 prev/chunk
        # pairs and per-segment embeddings are 1-2 row dispatches)
        spk = getattr(self.tasr, "spk", None)
        if spk is not None:
            from ..models.speaker import _SAMPLE_LADDER as SPK_LADDER

            for bucket in SPK_LADDER.rungs:
                if bucket > max(max_bucket, SPK_LADDER.rungs[0]):
                    break
                for rows in (1, 2):
                    spk.embed_batch([np.zeros(bucket, np.float32)] * rows)
                    n += 1
        # 4) overlap-flush separation: (window bucket × row rung)
        sep = getattr(self.ap, "separator", None)
        if sep is not None and getattr(sep, "_mb", None) is not None:
            for bucket in (32000, 64000, 96000, sep.window):
                if bucket > max(max_bucket, 32000) or bucket > sep.window:
                    continue
                for nb in rows_of(sep.ROW_LADDER):
                    items = [(np.zeros((1, bucket), np.float32),
                              np.ones(1, np.int64))] * nb
                    sep._run_mb(bucket, items)
                    n += 1
        return n

    # ---------------- preprocessing ----------------

    def chunk_preprocess(self, audio_data: np.ndarray, sampling_rate: int
                         ) -> np.ndarray:
        """mono → f32 → 16 kHz (reference :37-41)."""
        audio_data = self.ap.audio_to_mono(np.asarray(audio_data))
        audio_data = self.ap.int16_to_float32(audio_data)  # no-op on float
        audio_data, _ = self.ap.audio_resample(audio_data, sampling_rate, 16000)
        return audio_data

    # ---------------- main loop ----------------

    def infer_stream(self, audio_stream_generator: Generator,
                     target_file: Union[str, np.ndarray, io.BytesIO, None] = None,
                     sampling_rate: int = 16000, is_single: bool = False,
                     output_target_audio: bool = False,
                     metrics: dict | None = None):
        """Yields (target_spk, asr_result, target_audio) per flushed
        segment (reference :44-78).

        `metrics`: optional dict; when given, "emission_s" collects the
        chunk→result-emission latency per yielded segment (wall seconds
        from the arrival of the chunk that triggered its flush until the
        result is handed back) — the user-experienced latency family
        that per-chunk intake percentiles cannot bound once flushes run
        asynchronously."""
        state = StreamState()
        if metrics is not None:
            sink = metrics.setdefault("emission_s", [])
            state.on_emit = sink.append
        if target_file is not None:
            if not isinstance(target_file, np.ndarray):
                target_audio, sampling_rate = self.ap.read_audio(target_file)
            else:
                target_audio = target_file.copy()
            if len(target_audio) / sampling_rate >= 1.0:
                target_loudness = self.ap.meter_loudness(target_audio, sampling_rate)
                if np.isfinite(target_loudness):
                    state.system_loudness_diff = target_loudness + 23.0
                target_audio = self.audio_preprocess(
                    target_audio, sampling_rate, stream_mode=True,
                    output_audio_only=True)
                t_vad = self.tasr.asrp.vad_detection(target_audio, 16000)
                if t_vad:
                    start, end = t_vad[0][0], t_vad[-1][1]
                    if end - start < 4.0:
                        print("WARNING: The valid speaking duration of target "
                              "audio is less than 4s. This may cause a bad result.")
                    target_audio = self.ap.split_audio_by_time(
                        target_audio, 16000, start, end)
                state.target_embedding = self.tasr.get_target_embedding(
                    target_audio)
        fq = None
        if self.async_flush:
            fq = _FlushQueue(
                lambda a: list(self.process_single_chunk(a, is_single, state)),
                self.max_inflight_flushes, on_emit=state.on_emit)

        def parsed(result):
            asr_result, target_audio = self.asr_audio_parser(
                [result], "1", output_target_audio)
            return "1", asr_result, target_audio

        try:
            try:
                for pcm_chunk in audio_stream_generator:
                    t_recv = time.perf_counter()
                    chunk = self.chunk_preprocess(pcm_chunk, sampling_rate)
                    if fq is not None:
                        for result in fq.drain_ready():
                            yield parsed(result)
                    for result in self.process_vad_chunk(
                            chunk, is_single, state, flush_queue=fq,
                            t_arrival=t_recv):
                        yield parsed(result)
            finally:
                if state.vad_buffer:
                    t_fin = time.perf_counter()
                    combined = np.concatenate(state.vad_buffer)
                    sink = (fq.submit(combined, t_fin) if fq is not None else
                            self.process_single_chunk(combined, is_single,
                                                      state))
                    for result in sink:
                        if fq is None and state.on_emit is not None:
                            state.on_emit(time.perf_counter() - t_fin)
                        yield parsed(result)
                    state.clear_buffer()
                if fq is not None:
                    for result in fq.drain_all():
                        yield parsed(result)
        finally:
            if fq is not None:
                fq.close()

    # ---------------- buffering ----------------

    def process_vad_chunk(self, pcm_chunk: np.ndarray, is_single: bool,
                          state: StreamState, flush_queue=None,
                          t_arrival: float | None = None):
        """Buffer router (reference :81-107). With `flush_queue`, flushes
        are enqueued to the session's async worker instead of running
        in-line; yielded results are then earlier flushes' outputs.
        `t_arrival` (perf_counter at chunk receipt) feeds the
        chunk→result-emission latency metric."""
        if pcm_chunk is None or len(pcm_chunk) == 0:
            return

        def sync_flush(audio):
            for r in self.process_single_chunk(audio, is_single, state):
                if state.on_emit is not None and t_arrival is not None:
                    state.on_emit(time.perf_counter() - t_arrival)
                yield r
        is_silence = False
        if state.system_loudness_diff != 0.0:
            loud = self.ap.meter_loudness(pcm_chunk, 16000)
            gate = -23.0 + state.system_loudness_diff - self.loudness_diff_threshold
            if loud < gate:
                is_silence = True
                pcm_chunk = np.full_like(pcm_chunk, 1e-5, dtype=np.float32)
            self._log(f"PCM loudness: {loud} | {gate}")
        state.vad_buffer.append(pcm_chunk)
        state.buffer_duration += round(len(pcm_chunk) / 16000, 3)
        if not self.is_vad_buffer:
            if is_silence:
                return
            current = state.vad_buffer[-1]
            if flush_queue is not None:
                yield from flush_queue.submit(current, t_arrival)
            else:
                yield from sync_flush(current)
            state.clear_buffer()
            return
        if self.should_wait_for_next_chunk(state, is_silence=is_silence):
            return
        combined = np.concatenate(state.vad_buffer)
        if flush_queue is not None:
            yield from flush_queue.submit(combined, t_arrival)
        else:
            yield from sync_flush(combined)
        state.clear_buffer()

    def should_wait_for_next_chunk(self, state: StreamState,
                                   is_silence: bool = False) -> bool:
        """Flush decision cascade R1..R5 (reference :110-171)."""

        def trailing_gap_ok(audio: np.ndarray, vad_result: list) -> bool:
            if not vad_result:
                return True
            silence = len(audio) / 16000 - vad_result[-1][-1]
            return silence >= self.vad_min_silence

        # R1: buffer cap
        if state.buffer_duration >= self.max_buffer_duration:
            self._log("Buffer duration exceeds max_buffer_duration, processing")
            return False
        if not state.vad_buffer:
            return True
        combined = np.concatenate(state.vad_buffer)
        # whole-buffer VAD (silero's role) + last-chunk VAD + prev/chunk
        # speaker embeddings for R5 in ONE device dispatch
        # (pipeline/fused.py StreamChunkAnalyzer); the different gap
        # configs only affect the host-side segmenting state machine
        vad = self.tasr.asrp.vad
        similarity = None
        if vad is not None and self._stream_analyzer is not None:
            from ..models.vad import VADConfig, segment_probs

            fr = self._stream_analyzer.analyze_chunk(
                combined, state.vad_buffer[-1])
            buffer_vad = segment_probs(
                fr["probs_comb"], VADConfig(max_end_silence_time=0.1),
                fps=100.0)
            chunk_vad = segment_probs(fr["probs_chunk"], VADConfig(), fps=100.0)
            similarity = fr["similarity"]
        elif vad is not None:
            from ..models.vad import VADConfig, segment_probs

            probs_pair = vad.frame_probs_batch(
                [combined, state.vad_buffer[-1]])
            buffer_vad = segment_probs(
                probs_pair[0], VADConfig(max_end_silence_time=0.1), fps=100.0)
            chunk_vad = segment_probs(probs_pair[1], VADConfig(), fps=100.0)
        else:
            buffer_vad = [[0.0, len(combined) / 16000]]
            chunk_vad = [[0.0, 1.0]]
        # R2: silence chunk
        if is_silence:
            if trailing_gap_ok(combined, buffer_vad):
                self._log("Silence with sufficient gap, processing")
                return False
            return True
        # R3: no speech in current chunk → zero-substitute and wait
        if not chunk_vad:
            state.vad_buffer[-1] = np.full_like(
                state.vad_buffer[-1], 1e-5, dtype=np.float32)
            return True
        # R4: speech-complete gap
        if trailing_gap_ok(combined, buffer_vad):
            self._log("Speech appears complete, processing")
            return False
        # R5: speaker change
        if len(state.vad_buffer) > 1:
            if similarity is None:
                prev_audio = np.concatenate(state.vad_buffer[:-1])
                embs = self.tasr.spk.embed_batch(
                    [prev_audio, state.vad_buffer[-1]])
                similarity = self.tasr.cosine_similarity(embs[0], embs[1])
            if similarity < self.similarity_threshold:
                self._log("Different speaker detected, processing")
                return False
            return True
        return True

    # ---------------- per-segment processing ----------------

    def process_single_chunk(self, pcm_chunk: np.ndarray, is_single: bool,
                             state: StreamState):
        """Overlap check + streaming ASR (reference :174-186)."""
        is_overlap = False
        if self.od_pipeline is not None and not is_single:
            is_overlap = self.od_pipeline.is_overlap(pcm_chunk, sr=16000)
        result = self.asr_audio_streaming(pcm_chunk, is_overlap, state)
        if result is not None:
            state.prev_asr_text = result["text"]
            yield result

    def asr_audio_streaming(self, audio_data: np.ndarray,
                            is_overlap: bool, state: StreamState,
                            is_output_audio: bool = False):
        """Streaming segment ASR with self-enrollment (reference :189-258)."""

        def remove_punc(text: str) -> str:
            return re.sub(r"[^\w\s]", "", text or "").lower().strip()

        duration = round(len(audio_data) / 16000, 3)
        if duration < 0.4:
            return None
        segment_start = state.current_time
        state.current_time += duration
        more_args = {"asr_engine": self.asr_engine, "no_punc": False,
                     "preprocess": []}
        if self.use_asr_prompt and state.prev_asr_text:
            more_args["prompt"] = state.prev_asr_text

        if state.target_embedding is None:
            # first speech chunk self-enrolls the target speaker
            loud = self.ap.meter_loudness(audio_data, 16000)
            if np.isfinite(loud):
                state.system_loudness_diff = loud + 23.0
            audio_data = self.audio_preprocess(
                audio_data, 16000, stream_mode=True, output_audio_only=True)
            state.target_embedding = self.tasr.spk.get_speaker_embedding(
                audio_data, 16000)
            is_overlap = False
        else:
            audio_data = self.audio_preprocess(
                audio_data, 16000, stream_mode=True, output_audio_only=True)
        loud = self.ap.meter_loudness(audio_data, 16000)
        if loud < -23.0 + state.system_loudness_diff - self.loudness_diff_threshold:
            return None
        vad_result = self.tasr.asrp.vad_detection(audio_data, 16000)
        if not vad_result:
            return None

        if is_overlap:
            clips = self.tasr.multi_speakers_separate_asr(
                audio_data, target_embedding=state.target_embedding,
                more_args=more_args, is_output_audio=True)
        else:
            clips = self.tasr.single_speaker_asr(
                audio_data, more_args=more_args, is_output_audio=True)
        if not clips:
            return None
        if len(clips) > 1:
            clips.sort(key=lambda x: len(remove_punc(x["text"])), reverse=True)
        text = clips[0]["text"].strip()
        if not text:
            return None
        timerange = [segment_start + vad_result[0][0],
                     segment_start + vad_result[-1][-1]]
        segment_audio = clips[0]["audio"] if is_overlap else audio_data
        seg_emb = self.tasr.spk.get_speaker_embedding(segment_audio, 16000)
        is_target = self.tasr.is_same_person(
            seg_emb, state.target_embedding, threshold=self.similarity_threshold)
        return {
            "speaker": "1" if is_target else "0",
            "timerange": timerange,
            "text": text,
            "type": "overlap" if is_overlap else "single",
            "audio": segment_audio if is_output_audio else None,
        }
