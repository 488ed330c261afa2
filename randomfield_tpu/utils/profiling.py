"""Profiling hooks (SURVEY.md section 5: tracing/profiling aux subsystem).

The reference's only observability is a verbose flag printing timings;
here the same flag exists on the Generator, plus first-class
``jax.profiler`` capture for XLA-level analysis (op fusion, HBM traffic,
per-program timelines viewable in TensorBoard/Perfetto).
"""

from __future__ import annotations

import contextlib

import jax

__all__ = ["trace", "annotate"]


@contextlib.contextmanager
def trace(log_dir="/tmp/randomfield_tpu_trace"):
    """Capture a device trace around a block:

        with profiling.trace("/tmp/trace"):
            gen.generate_delta_field(0).block_until_ready()
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named region inside a trace (context manager)."""
    return jax.profiler.TraceAnnotation(name)
