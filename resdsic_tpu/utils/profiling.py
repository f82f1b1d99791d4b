"""Profiling / tracing hooks (aux subsystem the reference lacks, SURVEY §5).

- `trace(logdir)`: context manager around jax.profiler traces (view in
  TensorBoard / Perfetto).
- `StageTimer`: lightweight wall-clock stage accounting for the codec
  pipeline (device program vs d2h vs rANS vs h2d).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


@contextlib.contextmanager
def trace(logdir: str = "/tmp/resdsic_trace") -> Iterator[None]:
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(
                f"{name}: {self.totals[name]*1000:.1f}ms "
                f"({self.counts[name]} calls)"
            )
        return "\n".join(lines)
