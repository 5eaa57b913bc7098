"""Wall-clock phase timers used for observability (see SURVEY §5: the
reference has only tqdm/log-banner timing; we add structured per-phase
timers compatible with `jax.profiler` trace annotations)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional


class Timer:
    """Accumulating named-phase timer."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {"total_s": self.totals[name], "count": self.counts[name]}
            for name in self.totals
        }


@contextlib.contextmanager
def phase_timer(name: str, logger=None, trace: bool = False) -> Iterator[None]:
    """Time one phase; optionally annotate the JAX profiler trace."""
    ctx = contextlib.nullcontext()
    if trace:
        try:
            import jax.profiler

            ctx = jax.profiler.TraceAnnotation(name)
        except Exception:
            ctx = contextlib.nullcontext()
    t0 = time.perf_counter()
    with ctx:
        yield
    if logger is not None:
        logger.info("%s took %.3fs", name, time.perf_counter() - t0)
