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
