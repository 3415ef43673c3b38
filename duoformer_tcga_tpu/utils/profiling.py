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


def enable_nan_checks(on: bool = True):
    """jax_debug_nans: raise at the op that produced a NaN (debug runs
    only — forces sync dispatch)."""
    jax.config.update("jax_debug_nans", on)
