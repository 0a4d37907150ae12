"""Tracing / profiling hooks (SURVEY.md §5 "Tracing / profiling").

The reference has no profiling subsystem beyond a verbosity flag; the task
mandates per-stage wall-clock + GCUPS counters (SearchStats, in
search/manager.py) and ``jax.profiler`` trace hooks — this module is the
latter: a context manager that captures an xprof/perfetto trace of
everything dispatched inside it, exposed on the CLI as ``--xprof DIR``.
"""
from __future__ import annotations

import contextlib
import sys


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Capture a JAX profiler trace into ``log_dir`` (no-op when None).

    View with TensorBoard's profile plugin or ui.perfetto.dev.
    """
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"[libssa_tpu] profiler trace written to {log_dir}", file=sys.stderr)
