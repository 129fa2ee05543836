"""Tracing and throughput observability (SURVEY §5: the reference has no
profiler hooks; here per-step edges/s counters and jax.profiler annotations
are first-class).

* ``trace(name)``      — context manager adding a named region to TPU traces;
* ``start_profile`` /
  ``stop_profile``     — dump a jax.profiler trace to a directory;
* ``Throughput``       — epoch-level counter turning step counts into
                         edges/s, seeds/s, and step latency percentiles.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(name: str):
    with jax.profiler.TraceAnnotation(name):
        yield


def start_profile(log_dir: str) -> None:
    jax.profiler.start_trace(log_dir)


def stop_profile() -> None:
    jax.profiler.stop_trace()


def tree_edges_per_batch(batch_size: int, fanouts: tuple[int, ...]) -> int:
    """Sampled (parent, child) pairs per k-hop tree batch — the unit behind
    the edges/s counter (matches the BASELINE.md north-star metric)."""
    total, width = 0, batch_size
    for f in fanouts:
        width *= f
        total += width
    return total


class Throughput:
    """Accumulates per-step wall times; reports edges/s and percentiles."""

    def __init__(self, batch_size: int, fanouts: tuple[int, ...]):
        self.edges_per_batch = tree_edges_per_batch(batch_size, fanouts)
        self.batch_size = batch_size
        self._times: list[float] = []
        self._t0: float | None = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._t0 is not None:
            self._times.append(now - self._t0)
        self._t0 = now

    def epoch_stats(self) -> dict:
        if not self._times:
            return {}
        t = np.asarray(self._times)
        stats = {
            "steps": int(t.size),
            "step_ms_p50": float(np.percentile(t, 50) * 1e3),
            "step_ms_p99": float(np.percentile(t, 99) * 1e3),
            "edges_per_s": float(self.edges_per_batch / np.median(t)),
            "seeds_per_s": float(self.batch_size / np.median(t)),
        }
        self._times.clear()
        self._t0 = None
        return stats
