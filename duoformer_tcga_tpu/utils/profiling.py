"""Profiling & debug hooks (SURVEY §5.1-5.2).

jax.profiler trace capture around train/eval steps (Perfetto/XPlane dump
for xprof), named step annotations, and the NaN-check debug flag — the
TPU-native equivalents of the tracing the reference lacks entirely.
"""

from __future__ import annotations

import contextlib
import os

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/duoformer-trace"):
    """Capture a profiler trace: `with profiling.trace(dir): step(...)`.
    View with xprof/tensorboard or Perfetto."""
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def step_annotation(name: str):
    """Named span inside a trace (shows up on the xprof timeline)."""
    return jax.profiler.TraceAnnotation(name)


def enable_compile_cache(path: str = None):
    """Persistent XLA compilation cache (jax_compilation_cache_dir):
    executables are reused across PROCESSES keyed by HLO hash — on this
    environment's remote-compile transport a warm cache turns minutes of
    cold compile into milliseconds. Reads DUOFORMER_COMPILE_CACHE when
    path is None (no-op if unset); the CLI and bench.py call this at
    startup. Safe to call more than once."""
    path = path or os.environ.get("DUOFORMER_COMPILE_CACHE")
    if not path:
        return None
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # default floor is 1s — cache everything; tiny entries are cheap
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return path


def enable_nan_checks(on: bool = True):
    """jax_debug_nans: raise at the op that produced a NaN (debug runs
    only — forces sync dispatch)."""
    jax.config.update("jax_debug_nans", on)
