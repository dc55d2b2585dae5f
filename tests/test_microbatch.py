"""Unit tests for the cross-session micro-batching primitive
(runtime/microbatch.py) — pure host threading, no device needed."""

import threading
import time

import numpy as np
import pytest

from targetdiarization_tpu.runtime.microbatch import MicroBatcher


def test_single_caller_no_window_delay():
    """A lone caller must not pay the gather window."""
    calls = []

    def run(key, items):
        calls.append(list(items))
        return [x * 2 for x in items]

    mb = MicroBatcher(run, window_ms=50.0)
    t0 = time.perf_counter()
    assert mb.submit("k", 3) == 6
    dt = time.perf_counter() - t0
    assert dt < 0.040  # far below the 50 ms window
    assert calls == [[3]]


def test_concurrent_callers_coalesce():
    """8 threads submitting the same key within the window produce
    far fewer run_batch calls than items, and each gets its result."""
    n_calls = []

    def run(key, items):
        n_calls.append(len(items))
        time.sleep(0.01)  # simulated device forward
        return [x + 100 for x in items]

    mb = MicroBatcher(run, window_ms=20.0, max_batch=8)
    # prime the hot state: two overlapping submits
    results = [None] * 8
    barrier = threading.Barrier(8)

    def worker(i):
        barrier.wait()
        # several rounds so the hot heuristic engages after round 1
        for r in range(4):
            results[i] = mb.submit("k", i + r * 10)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    total_items = sum(n_calls)
    assert total_items == 32
    # coalescing must have happened (strictly fewer batches than items)
    assert len(n_calls) < total_items
    assert max(n_calls) > 1
    for i in range(8):
        assert results[i] == i + 30 + 100


def test_keys_never_mix():
    seen = []

    def run(key, items):
        seen.append((key, tuple(items)))
        return [key] * len(items)

    mb = MicroBatcher(run, window_ms=5.0)
    out = []

    def worker(k):
        out.append(mb.submit(k, 1))

    threads = [threading.Thread(target=worker, args=(k,))
               for k in ("a", "b", "a", "b")]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for key, items in seen:
        assert all(True for _ in items)
    assert sorted(out) == ["a", "a", "b", "b"]


def test_exception_propagates_to_all_waiters():
    def run(key, items):
        raise ValueError("boom")

    mb = MicroBatcher(run, window_ms=5.0)
    errs = []

    def worker():
        try:
            mb.submit("k", 0)
        except ValueError as e:
            errs.append(str(e))

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errs == ["boom"] * 4


def test_max_batch_splits():
    sizes = []

    def run(key, items):
        sizes.append(len(items))
        return list(items)

    mb = MicroBatcher(run, window_ms=30.0, max_batch=2)
    # force hot state so the leader gathers
    mb._last_multi = time.monotonic() + 10
    results = [None] * 5
    barrier = threading.Barrier(5)

    def worker(i):
        barrier.wait()
        results[i] = mb.submit("k", i)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(5)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == list(range(5))
    assert all(s <= 2 for s in sizes)


def test_leader_abort_releases_followers():
    """If the leader dies OUTSIDE run_batch (e.g. KeyboardInterrupt in
    the gather window), followers must get an exception instead of
    hanging forever on Event.wait()."""

    class Boom(BaseException):
        pass

    real_sleep = time.sleep

    def run(key, items):
        return list(items)

    mb = MicroBatcher(run, window_ms=40.0)
    mb._last_multi = time.monotonic() + 10  # force hot → leader sleeps

    orig = time.sleep

    def dying_sleep(s):
        orig(0.02)
        raise Boom()

    follower_err = []

    def follower():
        orig(0.005)  # let the leader enqueue first
        try:
            mb.submit("k", 2)
        except RuntimeError as e:
            follower_err.append(str(e))

    t = threading.Thread(target=follower)
    time.sleep = dying_sleep
    try:
        t.start()
        with pytest.raises(Boom):
            mb.submit("k", 1)
    finally:
        time.sleep = real_sleep
    t.join(timeout=5)
    assert not t.is_alive(), "follower hung after leader abort"
    assert follower_err and "leader aborted" in follower_err[0]
    # the pending list must be gone so the next submit gets a new leader
    assert mb.submit("k", 7) == 7


class TestASREngineMicrobatch:
    """Engine-level coverage of the ASR micro-batch path (ADVICE r3):
    concurrent == sequential, disabled-env, and mixed-t coalescing."""

    @pytest.fixture(scope="class")
    def engine(self):
        from targetdiarization_tpu.models.asr import ASREngine, Paraformer
        from targetdiarization_tpu.models.tokenizer import CharTokenizer

        tok = CharTokenizer()
        model = Paraformer(vocab_size=len(tok), dim=32, ffn=64,
                           enc_layers=2, dec_layers=1)
        return ASREngine(model=model, tokenizer=tok, seed=0)

    def test_concurrent_equals_sequential_mixed_t(self, engine):
        """Different-length clips inside ONE sample bucket coalesce with
        differing t per row; results must equal the sequential ones."""
        from concurrent.futures import ThreadPoolExecutor

        rng = np.random.default_rng(0)
        # same 1 s bucket, three distinct valid lengths → distinct t
        clips = [rng.standard_normal(n).astype(np.float32) * 0.1
                 for n in (15500, 12000, 9000, 15500, 12000, 9000)]
        seq = [engine.asr_detection(c)[0] for c in clips]
        before = engine._mb.items if engine._mb else 0
        with ThreadPoolExecutor(max_workers=6) as ex:
            conc = [r[0] for r in ex.map(engine.asr_detection, clips)]
        for a, b in zip(seq, conc):
            assert a["text"] == b["text"]
            assert a["timestamp"] == b["timestamp"]
        assert engine._mb is not None and engine._mb.items - before >= 6

    def test_disabled_env(self, monkeypatch):
        from targetdiarization_tpu.models.asr import ASREngine, Paraformer
        from targetdiarization_tpu.models.tokenizer import CharTokenizer

        monkeypatch.setenv("TD_MICROBATCH", "0")
        tok = CharTokenizer()
        model = Paraformer(vocab_size=len(tok), dim=32, ffn=64,
                           enc_layers=2, dec_layers=1)
        eng = ASREngine(model=model, tokenizer=tok, seed=0)
        assert eng._mb is None
        res = eng.asr_detection(np.zeros(8000, np.float32))
        assert set(res[0]) >= {"text", "timestamp"}


def test_separation_run_mb_stays_on_row_ladder():
    """Coalesced multi-row window batches must dispatch at ladder rungs
    only — a novel total (17, 23, ...) would trigger a fresh serve-time
    XLA compile while every coalesced session blocks (ADVICE r3 medium)."""
    from targetdiarization_tpu.models.separation import (
        MossFormer2,
        SeparationEngine,
    )

    model = MossFormer2(dim=32, enc_channels=32, num_blocks=1,
                        group_size=64, qk_dim=32, fsmn_inner=16)
    eng = SeparationEngine(model=model, window=1600, seed=0)
    if eng._mb is None:
        pytest.skip("microbatching disabled in this env")
    shapes = []
    real_apply = eng._apply

    def spy(p, wav, lengths):
        shapes.append(tuple(wav.shape))
        return real_apply(p, wav, lengths)

    eng._apply = spy
    rng = np.random.default_rng(1)
    # three 7-row items (7+7+7=21 rows > top rung 16; legacy code
    # dispatched a novel 21-row program)
    items = [(rng.standard_normal((7, 1600)).astype(np.float32) * 0.1,
              np.full(7, 1600, np.int64)) for _ in range(3)]
    out = eng._run_mb(1600, items)
    assert len(out) == 3
    for o in out:
        assert o.shape[0] == 7
    for s in shapes:
        assert s[0] in eng.ROW_LADDER, f"off-ladder row count {s[0]}"
    # row-identity: each item's result equals its solo dispatch
    solo = np.asarray(real_apply(
        eng._params_c,
        np.pad(items[0][0], ((0, 1), (0, 0))),
        np.concatenate([items[0][1], [1]]))).astype(np.float32)[:7]
    np.testing.assert_allclose(out[0], solo, atol=1e-5)


def test_result_order_matches_submit_order():
    def run(key, items):
        return [np.asarray(x) * 10 for x in items]

    mb = MicroBatcher(run, window_ms=10.0)
    vals = {}
    barrier = threading.Barrier(6)

    def worker(i):
        barrier.wait()
        vals[i] = int(mb.submit("k", i))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert vals == {i: i * 10 for i in range(6)}
