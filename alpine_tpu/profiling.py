"""Tracing / profiling / numerical-debug hooks.

The reference has no profiling support beyond a tqdm bar (SURVEY.md §5;
`/root/reference/alpine/main.py:489-494`).  TPU-native equivalents:

- `trace(logdir)`: context manager around `jax.profiler` producing a
  Perfetto/TensorBoard trace of everything inside (compile + device time).
- `annotate(name)`: named TraceAnnotation so fit phases show up in traces.
- `StepTimer`: lightweight wall-clock phase timer; `ALPINE.fit` always
  fills `model.timings_` with per-phase seconds (a few perf_counter calls
  per fit — too cheap to need an off switch).
- `enable_debug_checks()`: turns on jax_debug_nans/jax_debug_infs — the
  clamp-protected divides (ops/mu.py) should never produce them; this flag
  is the race/sanitizer-equivalent for a pure-functional program.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a device+host profiler trace into `logdir` (view with
    TensorBoard's profile plugin or Perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that appears in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Accumulates wall-clock per named phase into a dict."""

    def __init__(self, sink: Dict[str, float]):
        self.sink = sink

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            with annotate(f"alpine:{name}"):
                yield
        finally:
            self.sink[name] = self.sink.get(name, 0.0) + time.perf_counter() - t0


def enable_debug_checks() -> None:
    """Enable NaN/Inf detection in all jitted computations (debug only —
    forces value checks that disable some fusion)."""
    jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_debug_infs", True)


def disable_debug_checks() -> None:
    jax.config.update("jax_debug_nans", False)
    jax.config.update("jax_debug_infs", False)
