"""Profiling/tracing utilities.

Wraps `jax.profiler` for on-demand device traces (viewable in TensorBoard /
Perfetto) and provides a lightweight wall-clock timer registry for the
training loop's timing step — the observability mirror of the reference's
`rl/loop/steps/timing` plus what a TPU deployment actually needs (XLA
traces instead of perf counters).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace for the enclosed block:

        with device_trace('experiments/traces/run0'):
            state, _ = super_step(state, params)
            jax.block_until_ready(...)
    """
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timers:
    """Named wall-clock accumulators (host-side)."""

    def __init__(self):
        self.total: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.total[name] += time.perf_counter() - t0
            self.count[name] += 1

    def summary(self) -> Dict[str, float]:
        return {
            name: self.total[name] / max(self.count[name], 1)
            for name in self.total
        }

    def report(self) -> str:
        lines = [
            f"{name}: total {self.total[name]:.3f}s mean "
            f"{self.total[name] / max(self.count[name], 1) * 1e3:.2f}ms "
            f"x{self.count[name]}"
            for name in sorted(self.total)
        ]
        return "\n".join(lines)
