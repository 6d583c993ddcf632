"""Tracing / profiling hooks (SURVEY.md §5.1).

The reference exposes no profiler (its only cost signal is the README's
"higher FFT = more CPU" note); the rebuild provides proper device tracing:
``jax.profiler`` traces viewable in TensorBoard/Perfetto, plus named
annotations for the pipeline stages.  Fences are bench-mode-only — the
hot path never synchronizes (SURVEY.md §5.1).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace of the enclosed block into ``log_dir``
    (open with TensorBoard's profile plugin or Perfetto)."""
    with jax.profiler.trace(log_dir):
        yield


def annotation(name: str):
    """Named span that shows up on the device timeline."""
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Wall-clock per-stage timing with explicit device fences.

    Bench-mode only: each ``stop`` blocks on the given arrays, so using it
    in the hot loop would serialize dispatch (SURVEY.md §5.1).
    """

    def __init__(self):
        self.stages: dict[str, float] = {}
        self._t0: float | None = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, name: str, *block_on) -> float:
        if block_on:
            jax.block_until_ready(block_on)
        dt = time.perf_counter() - self._t0
        self.stages[name] = self.stages.get(name, 0.0) + dt
        self._t0 = time.perf_counter()
        return dt

    def report_us(self) -> dict[str, float]:
        return {k: round(v * 1e6, 1) for k, v in self.stages.items()}
