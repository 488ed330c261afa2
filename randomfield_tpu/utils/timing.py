"""Timing helpers (ref: the verbose prints in randomfield/generate.py).

On an async runtime wall-clock timing is only meaningful after a
``block_until_ready``; these helpers bake that in.
"""

from __future__ import annotations

import time

import jax

__all__ = ["Timer", "block_and_time"]


class Timer:
    """Context manager: ``with Timer('stage', verbose=True) as t: ...``."""

    def __init__(self, label="", verbose=False):
        self.label = label
        self.verbose = verbose
        self.elapsed = float("nan")

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        if self.verbose:
            print(f"[randomfield_tpu] {self.label}: {self.elapsed * 1e3:.1f} ms")
        return False


def block_and_time(fn, *args, iters=1, **kwargs):
    """Run ``fn`` ``iters`` times, blocking on each result; return (best_s, out)."""
    out = None
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out
