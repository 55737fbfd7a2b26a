"""Tracing / profiling utilities.

The reference has an unused wall-clock shim and no timing output
(SURVEY.md §5 tracing row, /root/reference/src/mjderivative.cpp:17-22).
Here: phase timers with device fencing, throughput helpers, and a
jax.profiler trace context for TensorBoard-compatible TPU traces.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict

import jax


def fence(tree) -> None:
    """Execution fence that is honest on remote/tunneled backends.

    `jax.block_until_ready` is NOT a reliable execution fence on this
    image's axon TPU tunnel (measured: returns in ~0.05 ms for a 1-GiB
    elementwise op whose value-fetch timing is ~29 ms — BENCH_NOTES.md
    round 4).  Fetching an actual VALUE cannot return early, so fence by
    pulling one scalar from every array leaf (tiny transfer, forces the
    producing computation to have executed)."""
    import numpy as np
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "ravel"):
            np.asarray(jax.device_get(leaf.ravel()[:1]))


# private alias: Timer.phase has a parameter named `fence`
_fence_tree = fence


class Timer:
    """Named phase timers with value-fetch fencing (see :func:`fence`).

    >>> t = Timer()
    >>> with t.phase("solve"):
    ...     out = solve(...)          # fenced on exit
    >>> t.report()
    """

    def __init__(self):
        self.times: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, fence=None):
        t0 = time.perf_counter()
        box = {}
        try:
            yield box
        finally:
            if "out" in box:
                _fence_tree(box["out"])
            elif fence is not None:
                _fence_tree(fence)
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.times.items(),
                                  key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:24s} {total:8.3f}s  x{n}  "
                         f"{total / n * 1e3:8.2f} ms/call")
        out = "\n".join(lines)
        print(out)
        return out

    def as_json(self) -> str:
        return json.dumps({
            k: {"total_s": v, "count": self.counts[k]}
            for k, v in self.times.items()})


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler device trace (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def throughput(n_items: int, seconds: float, unit: str = "items") -> str:
    return f"{n_items / seconds:,.0f} {unit}/s"
