"""Profiling / tracing utilities.

The reference has no profiling beyond ad-hoc prints (SURVEY.md §5).  This
module makes tracing first-class: ``jax.profiler`` trace capture around any
callable, plus simple wall-clock helpers for compile-vs-run accounting.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str, host_tracer_level: int = 2):
    """Capture a jax.profiler trace (viewable in TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def log_compile_time(fn, *args, label: str = "fn", log_fn=print):
    """Measure first-call (compile+run) vs steady-state time of a jitted fn."""
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_and_run = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    steady = time.perf_counter() - t0
    log_fn(
        f"{label}: first call {compile_and_run * 1e3:.1f} ms, "
        f"steady {steady * 1e3:.1f} ms"
    )
    return out, compile_and_run, steady
