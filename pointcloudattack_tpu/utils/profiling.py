"""Profiling helpers: jax.profiler traces + simple step timing.

TPU equivalent of the reference's ad-hoc ``time.time()`` stage
accumulators (SURVEY.md §5.1, e.g. attack/CW/CW_attack.py:105-177):
device timelines come from the XLA profiler, host-visible stages from
utils.metrics.StageTimer.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def profile_trace(logdir: str | None):
    """Capture a jax.profiler trace (view with TensorBoard/XProf).

    No-op when logdir is falsy, so callers can thread a CLI flag through.
    """
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def wall_clock(label: str, sink=print):
    """Host wall-clock for a block; reports '<label>: N.NNs'."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        sink(f"{label}: {time.perf_counter() - t0:.3f}s")
