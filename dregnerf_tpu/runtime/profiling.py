"""Profiling / tracing subsystem.

The reference has none (SURVEY.md §5: only time.time() around the
registration forward). Here profiling is first-class:
  * `trace(logdir)` context manager wraps jax.profiler for TensorBoard
    traces of any code region;
  * `PhaseTimer` accumulates wall-clock per named phase (host-side, cheap)
    and renders a summary — used by trainers for step/occupancy/validation
    breakdowns;
  * `annotate(name)` adds TraceAnnotations visible in the profiler UI.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the device trace (no-op overhead outside tracing)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class PhaseTimer:
    """Accumulating host-side phase timer.

    with timer.phase("train_step"): ...
    print(timer.summary())
    """

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        total = sum(self.totals.values()) or 1.0
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(
                f"{name:24s} {t:9.2f}s  {t / total * 100:5.1f}%  "
                f"x{n}  ({t / max(n, 1) * 1e3:.1f} ms avg)"
            )
        return "\n".join(lines)

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()
