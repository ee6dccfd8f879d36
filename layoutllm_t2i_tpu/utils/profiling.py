"""Tracing/profiling hooks (greenfield vs the reference, SURVEY.md §5).

Usage:
    with trace("plms_sample", logdir="/tmp/llt2i_trace"):
        pipe.sample_latents(...)
    # or phase timers:
    tm = PhaseTimer();
    with tm.phase("encode"): ...
    print(tm.report())
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


@contextlib.contextmanager
def trace(name: str, logdir: Optional[str] = None):
    """jax.profiler trace (TensorBoard-viewable) around a block; falls back to
    a named annotation when no logdir is given."""
    import jax

    if logdir:
        with jax.profiler.trace(logdir):
            with jax.profiler.TraceAnnotation(name):
                yield
    else:
        with jax.profiler.TraceAnnotation(name):
            yield


class PhaseTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        import jax

        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        rows = [
            f"{name}: total {self.totals[name]:.3f}s over {self.counts[name]} "
            f"({self.totals[name] / self.counts[name] * 1000:.1f} ms avg)"
            for name in sorted(self.totals)
        ]
        return "\n".join(rows)
