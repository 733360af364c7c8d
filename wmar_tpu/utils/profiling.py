"""Profiling + timing hooks.

The reference has no profiler integration (SURVEY §5) — only wall-clock
prints. Here: a ``jax.profiler`` trace context (viewable in XProf/
TensorBoard) and a lightweight section timer whose reports mirror the
reference's "Sampling took Xs" logs.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a device trace: ``with device_trace('/tmp/trace'): step()``."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Accumulating section timer (blocks on device results for honesty)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str, block_on=None):
        t0 = time.time()
        try:
            yield
        finally:
            if block_on is not None:
                import jax

                jax.block_until_ready(block_on)
            self.totals[name] += time.time() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(f"{name}: {tot:.3f}s total / {n} calls = {tot / n * 1000:.1f}ms")
        return "\n".join(lines)
