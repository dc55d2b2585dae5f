"""Global XLA-compile counter (jax.monitoring backend_compile events).

The streaming no-recompile invariant (BASELINE.md design point) is
checked per-engine by tests/test_no_recompile.py via jit cache sizes;
this counter covers the WHOLE process — any backend compile anywhere
(engines, fused programs, microbatcher rungs) bumps it, so a soak test
can assert "zero compiles after warmup" without enumerating programs.
"""

from __future__ import annotations

_COUNT = 0
_INSTALLED = False


def _listener(key: str, _duration, **_kw):
    global _COUNT
    if key.endswith("backend_compile_duration"):
        _COUNT += 1


def install() -> None:
    global _INSTALLED
    if _INSTALLED:
        return
    import jax.monitoring

    jax.monitoring.register_event_duration_secs_listener(_listener)
    _INSTALLED = True


def count() -> int:
    """Number of backend compiles observed since install() (installing
    on first use — call once before warmup, then diff)."""
    install()
    return _COUNT
