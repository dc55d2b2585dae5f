"""Pipelines: offline target diarization + real-time streaming engine.

    intervals.py   pure interval algebra (merge/subtract/IoU/overlap maps)
    diarize.py     sliding-window diarization + overlap refinement
    offline.py     TargetDiarization (end-to-end infer)
    streaming.py   TargetDiarizationStream (chunked real-time loop)
"""
