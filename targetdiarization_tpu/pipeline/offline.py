"""TargetDiarization: the end-to-end offline pipeline (L4).

TPU-native re-creation of the reference pipeline
(/root/reference/TargetDiarization.py:25): preprocess → diarize →
overlap-refine → target-ID → per-speaker combined ASR with char-timestamp
slicing → result assembly. Same public surface (`infer`,
`audio_preprocess`, parsers, interval algebra re-exported as methods) and
the same result schema:

    infer(...) -> (target_spk,
                   [{"speaker", "timerange", "text", "type", "score"}, ...],
                   target_audio | None)

Engine mapping (reference → here):
  modelscope CAM++ sd_pipeline (:73-77)  → ClusterDiarizer (long audio)
  pyannote od_pipeline (:84-87)          → SegmentationEngine (short audio
                                           diarization + overlap detect)
  TargetASR strategies                    → pipeline.target_asr.TargetASR
"""

from __future__ import annotations

import io
import math
import os
from typing import Union

import numpy as np

from . import intervals as iv
from ..runtime.trace import trace
from .target_asr import TargetASR
from ..processors.audio import AudioProcessor


class TargetDiarization:
    def __init__(
        self,
        target_asr: TargetASR | None = None,
        cluster_diarizer=None,
        segmentation_engine=None,
        asr_engine: str = "paraformer",
        target_similarity_threshold: float = 0.0,
        long_audio_threshold: float = 30.0,
        pyannote_clustering_threshold: float = 0.0,
        verbose_log: bool = False,
        seed: int = 0,
    ):
        self.verbose_log = verbose_log
        self.asr_engine = asr_engine
        self.target_similarity_threshold = target_similarity_threshold
        self.long_audio_threshold = long_audio_threshold
        # cosine-distance threshold for the post-segmentation embedding
        # reclustering (pyannote-3.1 clustering stage); the env knob
        # PYANNOTE_CLUSTERING_THRESHOLD pokes it, like the reference
        # pokes its pyannote pipeline (TargetDiarization.py:86-87)
        self.recluster_threshold = pyannote_clustering_threshold or 0.6
        self.tasr = target_asr or TargetASR(verbose_log=verbose_log, seed=seed)
        self.ap: AudioProcessor = self.tasr.ap

        if cluster_diarizer is None:
            from ..models.diarization import ClusterDiarizer, DiarizeConfig

            cfg = DiarizeConfig()
            if pyannote_clustering_threshold:
                cfg.clustering_threshold = pyannote_clustering_threshold
            cluster_diarizer = ClusterDiarizer(
                self.tasr.spk, vad_engine=self.tasr.asrp.vad, cfg=cfg
            )
        self.sd_pipeline = cluster_diarizer  # CAM++ slot
        self.od_pipeline = segmentation_engine  # pyannote slot (may be None)

        # fused frontend: ONE device program for preprocess → denoise →
        # VAD → segmentation → sliding embeddings (pipeline/fused.py);
        # falls back to the per-engine path when engines are missing
        self.fused = None
        self.fused_asr = None
        try:
            from .fused import FusedFrontend

            self.fused = FusedFrontend(
                denoiser=self.ap.denoiser,
                vad=self.tasr.asrp.vad,
                seg=self.od_pipeline,
                spk=self.tasr.spk,
            )
        except Exception as e:
            self._log(f"fused frontend unavailable: {e}")
        try:
            from ..models.asr import ASREngine
            from .fused import FusedASR

            if (isinstance(self.tasr.asrp.asr, ASREngine)
                    and self.tasr.asrp.asr.engine == "paraformer"):
                self.fused_asr = FusedASR(self.tasr.asrp.asr,
                                          self.tasr.asrp.punc)
        except Exception as e:
            self._log(f"fused ASR unavailable: {e}")
        self._enroll_cache: dict = {}

    def _log(self, *args):
        if self.verbose_log:
            print(*args)

    # ---------------- interval algebra (API parity re-exports) ----------------

    calc_single_iou = staticmethod(iv.calc_single_iou)
    calc_multi_iou = staticmethod(iv.calc_multi_iou)
    calc_iou_score = staticmethod(iv.calc_iou_score)
    sd_key_matcher = staticmethod(iv.sd_key_matcher)
    merge_timeranges = staticmethod(iv.merge_timeranges)
    subtract_timeranges = staticmethod(iv.subtract_timeranges)
    apply_od_result = staticmethod(iv.apply_od_result)
    subtract_overlap = staticmethod(iv.subtract_overlap)
    get_speaker_num = staticmethod(iv.get_speaker_num)
    get_speaker_overlap = staticmethod(iv.get_speaker_overlap)

    # ---------------- preprocessing ----------------

    def audio_preprocess(self, audio_data: np.ndarray, sampling_rate: int = 16000,
                         stream_mode: bool = False, output_audio_only: bool = False):
        """mono → f32 → 16 kHz → loudness → denoise (offline) or
        separation-denoise (streaming) → loudness
        (reference TargetDiarization.py:166-182)."""
        audio_data = self.ap.audio_to_mono(np.asarray(audio_data))
        audio_data = self.ap.int16_to_float32(audio_data)  # no-op on float
        try:
            audio_data, sampling_rate = self.ap.audio_resample(
                audio_data, sampling_rate, 16000)
            audio_data = self.ap.audio_loudness_control(audio_data, sampling_rate)
            if stream_mode:
                audio_data = self.ap.separate_speaker(audio_data, sampling_rate)[0]
            else:
                audio_data = self.ap.denoise_vocal(audio_data, sampling_rate)
            audio_data = self.ap.audio_loudness_control(audio_data, sampling_rate)
        except Exception as e:
            print(f"Failed in func audio_preprocess: {e}")
        if output_audio_only:
            return audio_data
        return audio_data, sampling_rate

    # ---------------- parsers ----------------

    def sd_result_parser(self, sd_result: dict, is_single: bool = False,
                         combine_timerange: bool = False) -> dict:
        """Parse {'text': [[s, e, spk], ...]} (CAM++ result shape) into an
        sd_result dict (reference :185-225)."""
        if not sd_result or not sd_result.get("text"):
            return {}
        return iv.parse_segments(sd_result["text"], is_single=is_single,
                                 combine=combine_timerange)

    def od_result_parser(self, od_result: dict, sd_result: dict | None = None,
                         is_single: bool = False, output_overlap: bool = True):
        """Take a segmentation diarization dict, optionally relabel its
        keys onto sd_result's, then reduce to pairwise overlaps
        (reference :228-246)."""
        if not od_result:
            return {}
        result = od_result
        if is_single:
            merged = []
            for ranges in od_result.values():
                merged.extend(ranges)
            result = {"0": iv.merge_timeranges(merged)}
        if sd_result:
            result = iv.sd_key_matcher(sd_result, result)
        if output_overlap:
            result = iv.get_speaker_overlap(result)
        return result

    # ---------------- target selection ----------------

    def sd_result_to_target_embedding(self, audio_data, sampling_rate=16000,
                                      sd_result=None, overlap_map=None,
                                      target_spk: str = "", fr=None):
        """Pick target speaker (longest total duration) and build its
        embedding from non-overlap clips (reference :551-578). With a
        fused-frontend result, the embedding is the mean of that
        speaker's precomputed sliding-window embeddings — no dispatch."""
        sd_result = sd_result or {}
        if not sd_result:
            return "", self.tasr.get_target_embedding(audio_data)
        if not target_spk or target_spk not in sd_result:
            target_spk = max(
                sd_result, key=lambda s: iv.total_duration(sd_result[s])
            ) if len(sd_result) > 1 else list(sd_result)[0]
        work = iv.subtract_overlap(sd_result, overlap_map) if overlap_map else sd_result
        ranges = [(s, e) for s, e in work.get(target_spk, []) if (e - s) >= 0.4]
        if fr is not None and fr.get("win_embs") is not None and ranges:
            embs = self._window_embs_in_ranges(fr, ranges)
            if len(embs):
                return target_spk, np.mean(embs, axis=0)
        clips = [
            self.ap.split_audio_by_time(audio_data, sampling_rate, s, e)
            for s, e in ranges
        ]
        if clips:
            target_audio = np.concatenate(clips, axis=0)
            emb = self.tasr.get_target_embedding(target_audio)
        else:
            emb = self.tasr.get_target_embedding(audio_data)
        return target_spk, emb

    @staticmethod
    def _window_embs_in_ranges(fr, ranges) -> np.ndarray:
        """Fused sliding-window embeddings whose midpoint falls inside
        any of `ranges` (and are non-degenerate)."""
        out = []
        for (s, e), emb in zip(fr["win_times"], fr["win_embs"]):
            mid = (s + e) / 2.0
            if np.linalg.norm(emb) == 0:
                continue
            if any(rs <= mid <= re for rs, re in ranges):
                out.append(emb)
        return np.asarray(out) if out else np.zeros((0, 192), np.float32)

    def target_embedding_to_target_spk(self, target_embedding, audio_data,
                                       sampling_rate=16000, sd_result=None,
                                       overlap_map=None, fr=None) -> str:
        """Score every speaker's clips vs the enrollment; best average
        wins (reference :581-599). With a fused-frontend result the
        scores come from the precomputed sliding-window embeddings
        (zero dispatches); otherwise clips are embedded in one batch."""
        sd_result = sd_result or {}
        if not sd_result:
            return ""
        work = iv.subtract_overlap(sd_result, overlap_map or [])
        score_map = []
        pending = []  # speakers with no window hit → batched clip fallback
        for spk, ranges in work.items():
            if fr is not None and fr.get("win_embs") is not None:
                embs = self._window_embs_in_ranges(fr, ranges)
                if len(embs):
                    scores = [self.tasr.cosine_similarity(target_embedding, e)
                              for e in embs]
                    score_map.append([spk, sum(scores) / len(scores)])
                    continue
            pending.append((spk, ranges))
        for spk, ranges in pending:
            clips = [
                self.ap.split_audio_by_time(audio_data, sampling_rate, s, e)
                for s, e in ranges
            ]
            clips = [c for c in clips if c.size]
            if not clips:
                continue
            embs = self.tasr.spk.embed_batch(clips, sr=sampling_rate,
                                             single_dispatch=True)
            scores = [
                self.tasr.cosine_similarity(target_embedding, e)
                for e in embs
                if np.linalg.norm(e) > 0
            ]
            if scores:
                score_map.append([spk, sum(scores) / len(scores)])
        if not score_map:
            return ""
        score_map.sort(key=lambda x: x[1], reverse=True)
        return score_map[0][0]

    def recheck_target_speaker(self, result: list, target_spk: str,
                               target_embedding, method: str = "recheck_target"
                               ) -> list:
        """Cosine re-verification; mismatches flip speaker to "-1"
        (reference :603-631). No-op when threshold == 0."""
        if not result:
            return []
        for item in result:
            item["score"] = -1.0
        if target_embedding is None or not self.target_similarity_threshold:
            return result
        audios = []
        idxs = []
        for i, item in enumerate(result):
            if method == "recheck_target" and item["speaker"] != target_spk:
                continue
            if method == "recheck_others" and item["speaker"] == target_spk:
                continue
            if item.get("audio") is None:
                continue
            idxs.append(i)
            audios.append(item["audio"])
        if not audios:
            return result
        embs = self.tasr.spk.embed_batch(audios)
        for i, emb in zip(idxs, embs):
            score = self.tasr.cosine_similarity(target_embedding, emb)
            result[i]["score"] = round(score, 3)
            if score >= self.target_similarity_threshold:
                result[i]["speaker"] = target_spk
            elif result[i]["speaker"] == target_spk:
                result[i]["speaker"] = "-1"
        return result

    # ---------------- ASR assembly ----------------

    def sd_result_to_asr_audio(self, audio_data, sampling_rate=16000,
                               sd_result=None, overlap_map=None,
                               target_spk: str = "", target_embedding=None,
                               fr=None) -> list:
        """Slice per-speaker clips (separating overlaps), then run ONE
        combined ASR per speaker on a silence-padded timeline and slice
        its char timestamps back onto each clip (reference :716-820).
        When every clip is an unmodified slice of the fused-frontend
        audio, ASR+punctuation run as ONE masked device program on the
        resident buffer (FusedASR) — no track re-upload."""
        sd_result = sd_result or {}
        overlap_map = overlap_map or []
        asr_result: list = []
        if not sd_result:
            return asr_result
        if overlap_map:
            singles = iv.subtract_overlap(sd_result, overlap_map)
            overlaps = iv.subtract_overlap(sd_result, overlap_map, reverse_output=True)
        else:
            singles, overlaps = sd_result, {}

        for spk, ranges in singles.items():
            for s, e in ranges:
                asr_result.append({
                    "speaker": spk, "timerange": [s, e], "text": "",
                    "type": "single",
                    "audio": self.ap.split_audio_by_time(audio_data, sampling_rate, s, e),
                })

        if not target_spk or target_embedding is None:
            for spk, ranges in overlaps.items():
                for s, e in ranges:
                    asr_result.append({
                        "speaker": spk, "timerange": [s, e], "text": "",
                        "type": "overlap",
                        "audio": self.ap.split_audio_by_time(audio_data, sampling_rate, s, e),
                    })
        else:
            noise_spks = sorted(set(sd_result) - {target_spk})
            # collect every overlap region, separate them all in one
            # batched forward (the reference loops one model call per
            # region, TargetDiarization.py:760)
            tasks = [
                (spk, s, e)
                for spk, ranges in overlaps.items()
                if spk not in noise_spks
                for s, e in ranges
            ]
            clips = [
                self.ap.split_audio_by_time(audio_data, sampling_rate, s, e)
                for _, s, e in tasks
            ]
            seps = (self.tasr.multi_speakers_separate_batch(
                clips, target_embedding, threshold=0.0, sr=sampling_rate)
                if clips else [])
            for (spk, s, e), sep in zip(tasks, seps):
                if not sep:
                    continue
                t_audio = self.ap.audio_loudness_control(
                    sep[0]["audio"], sampling_rate)
                t_range = [round(s + sep[0]["timerange"][0], 3),
                           round(s + sep[0]["timerange"][1], 3)]
                asr_result.append({
                    "speaker": spk, "timerange": t_range, "text": "",
                    "type": "overlap", "audio": t_audio, "_sep": True,
                })
                if noise_spks and len(sep) > 1:
                    n_range = [round(s + sep[1]["timerange"][0], 3),
                               round(s + sep[1]["timerange"][1], 3)]
                    asr_result.append({
                        "speaker": noise_spks[0], "timerange": n_range,
                        "text": "", "type": "overlap",
                        "audio": sep[1]["audio"], "_sep": True,
                    })

        if not asr_result:
            return asr_result
        asr_result.sort(key=lambda x: x["timerange"][0])

        new_result = []
        speakers = sorted({item["speaker"] for item in asr_result})
        combined_map = {
            spk: self.combine_audio_chunks(asr_result, spk, sampling_rate)
            for spk in speakers
        }
        speakers = [s for s in speakers if combined_map[s] is not None]

        asr_results = None
        punc_in_graph = False
        if (self.fused_asr is not None and fr is not None
                and fr.get("audio_dev_i16") is not None
                and not any(item.get("_sep") for item in asr_result)
                and len(speakers) <= 8):
            spk_ranges = [
                [item["timerange"] for item in asr_result
                 if item["speaker"] == spk]
                for spk in speakers
            ]
            if all(len(r) <= 32 for r in spk_ranges):
                try:
                    asr_results = self.fused_asr.transcribe_masked(
                        fr["audio_dev_i16"], fr["n_samples"], spk_ranges)
                    punc_in_graph = all(
                        r.get("punc_cls") is not None for r in asr_results)
                except Exception as e:
                    print(f"fused ASR failed, batched fallback: {e}")
                    asr_results = None
        if asr_results is None:
            # ONE batched ASR dispatch for all speakers' combined tracks
            asr_results = self.tasr.asrp.asr_detection_batch(
                [combined_map[s] for s in speakers], sampling_rate,
                no_punc=True)

        from ..models.punctuation import PUNC_LIST

        for spk, asr in zip(speakers, asr_results):
            combined = combined_map[spk]
            timestamps = asr.get("timestamp") or []
            if not timestamps:
                entry = {
                    "speaker": spk,
                    "timerange": [asr_result[0]["timerange"][0],
                                  asr_result[-1]["timerange"][1]],
                    "text": asr["text"].strip(), "type": "single",
                    "audio": combined,
                }
                if punc_in_graph and asr.get("punc_cls"):
                    entry["_chars"] = list(asr["text"])
                    entry["_cls"] = asr["punc_cls"]
                    entry["_joiner"] = ""
                new_result.append(entry)
                continue
            lang = asr.get("language") or self.tasr.asrp.detect_language(asr["text"])
            chars = list(asr["text"])
            pcls = asr.get("punc_cls") if punc_in_graph else None
            joiner = "" if lang in ("zh", "ja", "ko", "yue") else " "
            for item in asr_result:
                if item["speaker"] != spk:
                    continue
                lo = math.floor(item["timerange"][0] * 10) / 10 * 1000
                hi = math.ceil(item["timerange"][1] * 10) / 10 * 1000
                idxs = [
                    i for i, (ts, te) in enumerate(timestamps)
                    if i < len(chars) and lo <= ts <= hi
                ]
                item["text"] = joiner.join(chars[i] for i in idxs).strip()
                if pcls is not None:
                    item["_chars"] = [chars[i] for i in idxs]
                    item["_cls"] = [pcls[i] if i < len(pcls) else 0
                                    for i in idxs]
                    item["_joiner"] = joiner
                new_result.append(item)

        if punc_in_graph:
            # classes came from the fused program; apply per token so
            # non-CJK word joiners can't shift the alignment
            for item in new_result:
                chars = item.pop("_chars", None)
                cls = item.pop("_cls", None)
                joiner = item.pop("_joiner", "")
                if not item["text"] or not chars:
                    continue
                units = [ch + PUNC_LIST[int(c)] for ch, c in zip(chars, cls)]
                text = joiner.join(units).strip()
                if text and text[-1] not in "。？！.!?":
                    text += "。"
                item["text"] = text
        else:
            # ONE punctuation dispatch for all segments (was one per segment)
            restored = self.tasr.asrp.punctuation_restore_batch(
                [item["text"] for item in new_result])
            for item, text in zip(new_result, restored):
                item["text"] = text
        for item in new_result:
            item.pop("_sep", None)
            item.pop("_chars", None)
            item.pop("_cls", None)
            item.pop("_joiner", None)
        new_result.sort(key=lambda x: x["timerange"][0])
        return new_result

    @staticmethod
    def combine_audio_chunks(asr_result: list, speaker: str,
                             sampling_rate: int = 16000):
        """Concatenate one speaker's clips on a silence-padded timeline
        (reference :822-838)."""
        pieces = []
        cursor = 0.0
        for item in asr_result:
            if item["speaker"] != speaker:
                continue
            if cursor < item["timerange"][0]:
                pieces.append(np.zeros(
                    int((item["timerange"][0] - cursor) * sampling_rate),
                    np.float32))
            pieces.append(np.asarray(item["audio"], np.float32))
            cursor = item["timerange"][1]
        if not pieces:
            return None
        return np.concatenate(pieces, axis=0)

    def asr_audio_parser(self, asr_result: list, target_spk: str,
                         output_target_audio: bool = True):
        """Strip audio from results; optionally assemble the target
        speaker's silence-padded track (reference :841-873)."""
        result = []
        if not asr_result:
            return result, None
        if isinstance(asr_result, dict):
            asr_result = [asr_result]
        if not output_target_audio:
            for item in asr_result:
                item.pop("audio", None)
                result.append(item)
            return result, None
        sr = 16000
        asr_result.sort(key=lambda x: x["timerange"][0])
        pieces = []
        cursor = 0.0
        for item in asr_result:
            if item["speaker"] == target_spk:
                gap = int((item["timerange"][0] - cursor) * sr)
                if gap > 0:
                    pieces.append(np.zeros(gap, np.float32))
                clip = item.get("audio")
                if clip is None:  # streaming results may omit audio
                    clip = np.zeros(
                        int((item["timerange"][1] - item["timerange"][0]) * sr),
                        np.float32)
                pieces.append(np.asarray(clip, np.float32))
                cursor = item["timerange"][1]
            item.pop("audio", None)
            result.append(item)
        if cursor < asr_result[-1]["timerange"][1]:
            pieces.append(np.zeros(
                int((asr_result[-1]["timerange"][1] - cursor) * sr), np.float32))
        target_audio = np.concatenate(pieces) if pieces else None
        return result, target_audio

    # ---------------- main entry ----------------

    def prewarm(self, n_samples: int, target_samples: int = 0,
                n_spk: int = 2) -> float:
        """Compile the hot device programs for an `n_samples`-long input
        in PARALLEL threads (XLA compilation releases the GIL, so the
        fused analyze / separation / ASR programs — each tens of seconds
        to compile cold — overlap instead of serializing through the
        first infer). Wasted warms are harmless: anything the real run
        needs that prewarm missed still compiles lazily. Returns elapsed
        seconds. (VERDICT r3 ask 1: driver cold-start <120 s.)"""
        import time as _time
        from concurrent.futures import ThreadPoolExecutor

        t0 = _time.time()
        jobs = []
        if self.fused is not None:
            n = max(int(n_samples), 1600)
            jobs.append(("analyze", lambda: self.fused.analyze(
                np.zeros(n, np.float32))))
            if target_samples:
                te = max(int(target_samples), 1600)
                jobs.append(("enroll", lambda: self.fused.enroll(
                    np.zeros(te, np.float32))))
        if self.fused_asr is not None and self.fused is not None:
            from .fused import _LADDER

            bucket = _LADDER.bucket(
                min(max(int(n_samples), 1), _LADDER.rungs[-1]))

            def warm_asr():
                import jax.numpy as jnp

                dev = jnp.zeros((bucket,), jnp.int16)
                self.fused_asr.transcribe_masked(
                    dev, bucket, [[(0.0, 0.5)]] * n_spk)

            jobs.append(("asr", warm_asr))
        fsep = self.tasr._fused_separation()
        if fsep is not None:
            jobs.append(("separate", lambda: fsep.separate_score(
                [np.zeros(16000, np.float32)])))

        def timed(j):
            jt = _time.time()
            j()
            return _time.time() - jt

        with ThreadPoolExecutor(max_workers=max(len(jobs), 1)) as ex:
            futs = [ex.submit(timed, j) for _, j in jobs]
            for (name, _), f in zip(jobs, futs):
                try:
                    self._log(f"prewarm[{name}]: {f.result():.1f}s")
                except Exception as e:  # a failed warm only delays, never breaks
                    self._log(f"prewarm job failed (ignored): {e}")
        return _time.time() - t0

    def infer(self, wav_file: Union[str, np.ndarray, io.BytesIO],
              target_file: Union[str, np.ndarray, io.BytesIO, None] = None,
              sampling_rate: int = 16000, is_single: bool = False,
              output_target_audio: bool = True):
        """Full offline inference (reference TargetDiarization.py:98-163).

        With the fused frontend available, the front half runs as ONE
        device program (preprocess+denoise+VAD+segmentation+sliding
        embeddings) plus one cached program per distinct target file —
        the per-engine fallback path below is behavior-equivalent."""
        if isinstance(wav_file, (str, io.BytesIO)):
            audio_data, sampling_rate = self.ap.read_audio(wav_file)
        else:
            audio_data = np.asarray(wav_file)
        fr = None
        if self.fused is not None:
            with trace("infer/preprocess"):
                try:
                    mono = self.ap.audio_to_mono(audio_data)
                    fr = self.fused.analyze(mono, sr=sampling_rate)
                    audio_data, sampling_rate = fr["audio"], 16000
                except Exception as e:
                    print(f"fused analyze failed, per-engine fallback: {e}")
                    fr = None
        if fr is None:
            with trace("infer/preprocess"):
                audio_data, sampling_rate = self.audio_preprocess(
                    audio_data, sampling_rate)

        target_embedding = None
        if target_file is not None:
            with trace("infer/target_enroll"):
                target_embedding = self._enroll_target(target_file, sampling_rate)

        duration = len(audio_data) / sampling_rate
        sd_result = None
        seg_sd = None  # segmentation diarization (pyannote-slot) result
        if duration >= self.long_audio_threshold or self.od_pipeline is None:
            try:
                with trace("infer/diarize_cluster"):
                    raw = {"text": self._cluster_segments(
                        audio_data, sampling_rate, fr=fr)}
                sd_result = self.sd_result_parser(raw, is_single=is_single)
            except Exception as e:
                sd_result = None
                print(e)
        if not sd_result and self.od_pipeline is not None:
            with trace("infer/diarize_segmentation"):
                seg_sd = self._segmentation_sd(audio_data, sampling_rate, fr)
            if is_single:
                # the reference's single-speaker path feeds the WHOLE
                # clip to ASR (TargetASR.single_speaker_asr :658 — the
                # engine's own VAD handles splitting); slicing by the
                # segmentation net here cost quiet onsets (a 0.3 s
                # missed attack dropped leading characters). Short
                # clips use one full-range segment; long audio keeps
                # the merged segmentation spans for bucket limits.
                if duration <= 30.0:
                    sd_result = {"0": [(0.0, round(duration, 3))]}
                else:
                    merged = []
                    for ranges in seg_sd.values():
                        merged.extend(ranges)
                    sd_result = (
                        {"0": iv.merge_timeranges(merged)} if merged else {})
            else:
                with trace("infer/recluster"):
                    sd_result = self._recluster_sd(
                        audio_data, sampling_rate, seg_sd)
                if sd_result is not seg_sd:
                    # reclustered labels already encode each overlap
                    # under both voices; derive the overlap map from
                    # them directly (seg channel keys no longer align)
                    seg_sd = sd_result
        sd_result = sd_result or {}
        self._log("sd_result:", sd_result)

        overlap_map = []
        target_spk = ""
        if not is_single:
            od_result = {}
            if self.od_pipeline is not None:
                if seg_sd is None:
                    seg_sd = self._segmentation_sd(audio_data, sampling_rate, fr)
                od_result = self.od_result_parser(seg_sd, sd_result=sd_result)
            self._log("od_result:", od_result)
            sd_result, overlap_map = iv.apply_od_result(sd_result, od_result)
            self._log("refined sd_result:", sd_result, "overlap_map:", overlap_map)
            with trace("infer/target_id"):
                if target_embedding is not None:
                    target_spk = self.target_embedding_to_target_spk(
                        target_embedding, audio_data, sampling_rate, sd_result,
                        overlap_map, fr=fr)
                else:
                    target_spk, target_embedding = self.sd_result_to_target_embedding(
                        audio_data, sampling_rate, sd_result, overlap_map, fr=fr)
            self._log("target_spk:", target_spk)

        with trace("infer/asr_assembly"):
            asr_result = self.sd_result_to_asr_audio(
                audio_data, sampling_rate, sd_result, overlap_map, target_spk,
                target_embedding, fr=fr)
        with trace("infer/recheck"):
            asr_result = self.recheck_target_speaker(asr_result, target_spk,
                                                     target_embedding)
        asr_result, target_audio = self.asr_audio_parser(
            asr_result, target_spk, output_target_audio)
        return target_spk, asr_result, target_audio

    def _cluster_segments(self, audio_data, sampling_rate, fr=None) -> list:
        sd = None
        if (fr is not None and fr.get("win_embs") is not None
                and hasattr(self.sd_pipeline, "diarize_from_windows")):
            wins, embs = self._speech_windows(fr)
            if wins:
                sd = self.sd_pipeline.diarize_from_windows(wins, embs)
        if sd is None:
            sd = self.sd_pipeline.diarize(audio_data, sr=sampling_rate)
        segments = []
        for spk, ranges in sd.items():
            for s, e in ranges:
                segments.append([s, e, int(spk)])
        segments.sort(key=lambda x: x[0])
        if not segments:
            raise RuntimeError("cluster diarizer produced no segments")
        return segments

    def _recluster_sd(self, audio_data, sampling_rate, seg_sd: dict) -> dict:
        """Global speaker attribution over the segmentation output —
        the clustering half of the reference's pyannote-3.1 pipeline
        (local segmentation channels carry no global voice identity;
        pyannote assigns final labels by agglomerative clustering of
        per-region speaker embeddings).

        The timeline is decomposed into CLEAN pieces (exactly one channel
        active — reliable to embed) and OVERLAP spans (≥2 channels — the
        audio carries several voices, so embeddings are contaminated).
        Clean pieces ≥0.3 s are embedded in one batched forward and
        AHC-clustered; shorter ones inherit the nearest clustered piece's
        label. Overlap spans are attributed to the clusters of the
        temporally adjacent clean pieces (local segmentation guarantees
        voice continuity across the boundary — the same assumption
        pyannote's stitching makes). The result encodes each overlap
        under BOTH its clusters, so the overlap map can be derived
        directly from it (infer passes it through od_result_parser)."""
        channels = {k: iv.merge_timeranges(v) for k, v in seg_sd.items()}
        all_ranges = [r for rs in channels.values() for r in rs]
        if len(all_ranges) < 2:
            return seg_sd
        pair_map = iv.get_speaker_overlap(channels, min_overlap_sec=0.2)
        overlap_spans = iv.merge_timeranges(
            [r for rs in pair_map.values() for r in rs])
        clean = []
        for spk, ranges in channels.items():
            for s, e in iv.subtract_timeranges(ranges, overlap_spans):
                if e - s >= 0.1:
                    clean.append((s, e))
        clean.sort()
        if not clean:
            return seg_sd
        big = [i for i, (s, e) in enumerate(clean) if e - s >= 0.3]
        if len(big) >= 2:
            clips = [self.ap.split_audio_by_time(
                audio_data, sampling_rate, *clean[i]) for i in big]
            try:
                embs = np.asarray(self.tasr.spk.embed_batch(
                    clips, sr=sampling_rate))
            except Exception:
                return seg_sd
            embs = embs / np.maximum(
                np.linalg.norm(embs, axis=-1, keepdims=True), 1e-9)
            from sklearn.cluster import AgglomerativeClustering

            labels = AgglomerativeClustering(
                n_clusters=None,
                distance_threshold=self.recluster_threshold,
                metric="cosine", linkage="average",
            ).fit_predict(embs)
        elif len(big) == 1:
            labels = [0]
        else:
            return seg_sd
        cluster = dict(zip(big, (int(x) for x in labels)))
        # short pieces inherit the nearest clustered piece's label
        for i, (s, e) in enumerate(clean):
            if i not in cluster:
                mid = (s + e) / 2
                j = min(big, key=lambda k: abs(
                    (clean[k][0] + clean[k][1]) / 2 - mid))
                cluster[i] = cluster[j]
        out: dict = {}
        for i, (s, e) in enumerate(clean):
            out.setdefault(cluster[i], []).append((s, e))
        n_clusters = len(set(cluster.values()))
        fresh = max(cluster.values()) + 1
        for s, e in overlap_spans:
            labs = []
            prev = [i for i, (cs, ce) in enumerate(clean) if ce <= s + 1e-6]
            nxt = [i for i, (cs, ce) in enumerate(clean) if cs >= e - 1e-6]
            if prev:
                labs.append(cluster[max(prev, key=lambda i: clean[i][1])])
            if nxt:
                labs.append(cluster[min(nxt, key=lambda i: clean[i][0])])
            labs = list(dict.fromkeys(labs))
            if len(labs) < 2:
                # overlap needs two voices: take any other cluster, or a
                # fresh label if only one voice was ever seen cleanly
                others = [c for c in set(cluster.values()) if c not in labs]
                labs.append(others[0] if others else fresh)
            for lab in labs[:2]:
                out.setdefault(lab, []).append((s, e))
        out = {k: iv.merge_timeranges(v) for k, v in out.items()}
        # renumber by first appearance time
        order = {k: i for i, (k, _) in enumerate(
            sorted(out.items(), key=lambda kv: kv[1][0][0]))}
        out = {str(order[k]): v for k, v in out.items()}
        self._log("reclustered sd_result:", out,
                  f"({n_clusters} voice clusters)")
        return out

    def _segmentation_sd(self, audio_data, sampling_rate, fr=None) -> dict:
        """pyannote-slot diarization, reusing fused activations when
        available (zero extra dispatches)."""
        if fr is not None and fr.get("seg_act") is not None:
            from ..models.diarization import activations_to_diarization

            sd = activations_to_diarization(
                fr["seg_act"], self.od_pipeline.fps)
        else:
            sd = self.od_pipeline.diarize(audio_data, sr=sampling_rate)
        # Binarize speech_pad can push the last boundary past the audio;
        # conversely the offset threshold trims fading final vowels —
        # snap boundaries to the audio edges when the residual gap is
        # tiny (a 0.2 s trailing trim cost the last character of short
        # utterances; VAD post-processing in the reference absorbs such
        # gaps via max_end_silence_time). When fused VAD probabilities
        # are available, snap to the VAD-OBSERVED speech span instead of
        # the raw file edges: the FSMN VAD is frame-accurate at 10 ms,
        # and snapping a leading/trailing boundary to 0/dur charges a
        # false alarm for every silent sample at the edges (~0.006
        # no-collar DER on the fixture).
        dur = round(len(audio_data) / sampling_rate, 3)
        lo, hi = 0.0, dur
        if fr is not None and fr.get("vad_probs") is not None:
            from ..models.vad import VADConfig, segment_probs

            spans = segment_probs(np.asarray(fr["vad_probs"]),
                                  VADConfig(speech_pad=0.0))
            if spans:
                lo = min(max(spans[0][0], 0.0), dur)
                hi = max(min(spans[-1][1], dur), lo)
        snap = 0.3
        out = {}
        for k, v in sd.items():
            ranges = []
            for s, e in v:
                if s >= dur:
                    continue
                e = min(e, dur)
                if s < snap:
                    s = min(lo, s + snap)
                if dur - e < snap:
                    e = max(hi, e - snap)
                ranges.append((s, e))
            if ranges:
                out[k] = ranges
        return out

    def _speech_windows(self, fr):
        """Fused sliding windows restricted to speech: keep windows whose
        overlap with VAD speech is ≥ the diarizer's min_window (mirrors
        ClusterDiarizer windowing within VAD segments)."""
        from ..models.vad import VADConfig, segment_probs

        speech = segment_probs(np.asarray(fr["vad_probs"]), VADConfig())
        min_cov = getattr(getattr(self.sd_pipeline, "cfg", None),
                          "min_window", 0.5)
        wins, embs = [], []
        for (s, e), emb in zip(fr["win_times"], fr["win_embs"]):
            cov = sum(max(0.0, min(e, se) - max(s, ss)) for ss, se in speech)
            if cov >= min_cov and np.linalg.norm(emb) > 0:
                wins.append((s, e))
                embs.append(emb)
        return wins, np.asarray(embs) if embs else np.zeros((0, 192), np.float32)

    def _enroll_target(self, target_file, sampling_rate: int):
        """Target enrollment with a content-keyed cache (same enrolled
        speaker across calls ⇒ zero dispatches) and the fused one-dispatch
        program when available."""
        key = self._enroll_key(target_file)
        if key is not None and key in self._enroll_cache:
            return self._enroll_cache[key]
        if isinstance(target_file, (str, io.BytesIO)):
            t_audio, t_sr = self.ap.read_audio(target_file)
        else:
            t_audio, t_sr = np.asarray(target_file), sampling_rate
        target_embedding = None
        if self.fused is not None:
            try:
                from ..models.vad import VADConfig, segment_probs

                er = self.fused.enroll(self.ap.audio_to_mono(t_audio), sr=t_sr)
                t_vad = segment_probs(er["vad_probs"], VADConfig())
                if t_vad:
                    if t_vad[-1][1] - t_vad[0][0] < 4.0:
                        print("WARNING: The valid speaking duration of target "
                              "audio is less than 4s. This may cause a bad result.")
                    target_embedding = er["emb"]
                else:
                    print("ERROR: No VAD result in target audio. Automatically "
                          "select one speaker from the input audio as the target.")
                if key is not None:
                    self._enroll_cache[key] = target_embedding
                    if len(self._enroll_cache) > 32:
                        self._enroll_cache.pop(next(iter(self._enroll_cache)))
                return target_embedding
            except Exception as e:
                print(f"fused enroll failed, per-engine fallback: {e}")
        t_audio, t_sr = self.audio_preprocess(t_audio, t_sr)
        t_vad = self.tasr.asrp.vad_detection(t_audio, t_sr)
        if t_vad:
            start, end = t_vad[0][0], t_vad[-1][1]
            if end - start < 4.0:
                print("WARNING: The valid speaking duration of target "
                      "audio is less than 4s. This may cause a bad result.")
            t_audio = self.ap.split_audio_by_time(t_audio, t_sr, start, end)
            target_embedding = self.tasr.get_speaker_embedding(t_audio, t_sr)
        else:
            print("ERROR: No VAD result in target audio. Automatically "
                  "select one speaker from the input audio as the target.")
        if key is not None:
            self._enroll_cache[key] = target_embedding
            if len(self._enroll_cache) > 32:
                self._enroll_cache.pop(next(iter(self._enroll_cache)))
        return target_embedding

    @staticmethod
    def _enroll_key(target_file):
        """Stable content key for the enrollment cache; None = uncacheable."""
        import hashlib

        try:
            if isinstance(target_file, str):
                st = os.stat(target_file)
                return ("path", target_file, st.st_mtime_ns, st.st_size)
            if isinstance(target_file, np.ndarray):
                return ("arr", hashlib.blake2b(
                    np.ascontiguousarray(target_file).tobytes(),
                    digest_size=16).hexdigest())
            if isinstance(target_file, io.BytesIO):
                return ("bytes", hashlib.blake2b(
                    target_file.getvalue(), digest_size=16).hexdigest())
        except Exception:
            return None
        return None
