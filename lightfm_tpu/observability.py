"""Observability: profiler hooks and throughput counters.

The reference has no tracing/profiling beyond optional tqdm progress
(SURVEY §5); for a TPU framework the equivalents are XLA profiler traces
and per-fit examples/s counters (``LightFM.fit_stats_``).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a JAX/XLA profiler trace viewable in TensorBoard/Perfetto.

    Example::

        with lightfm_tpu.observability.trace("/tmp/trace"):
            model.fit(interactions, epochs=10)
    """
    with jax.profiler.trace(logdir):
        yield


class FitStats:
    """Wall-clock + throughput bookkeeping for one fit call."""

    def __init__(self, n_examples: int, epochs: int):
        self.n_examples = n_examples
        self.epochs = epochs
        self.wall_s: Optional[float] = None
        self.examples_per_sec: Optional[float] = None
        self._t0 = time.perf_counter()

    def finish(self) -> "FitStats":
        self.wall_s = time.perf_counter() - self._t0
        total = self.n_examples * self.epochs
        self.examples_per_sec = total / self.wall_s if self.wall_s > 0 else 0.0
        return self

    def as_dict(self) -> dict:
        return {
            "examples": self.n_examples,
            "epochs": self.epochs,
            "wall_s": self.wall_s,
            "examples_per_sec": self.examples_per_sec,
        }

    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        return f"FitStats({self.as_dict()})"
