"""Profiling helpers.

The reference has no tracing (SURVEY.md §5); here jax.profiler traces plus a
lightweight phase timer cover it.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace (viewable in TensorBoard/XProf); no-op if dir is None."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


class PhaseTimer:
    """Wall-clock per-phase timing with a one-line report."""

    def __init__(self) -> None:
        self.phases: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        total = sum(self.phases.values())
        parts = ", ".join(f"{k}={v * 1e3:.1f}ms" for k, v in self.phases.items())
        return f"phases: {parts} (total {total * 1e3:.1f}ms)"
