"""Phase timers + optional device profiling.

Role of the reference's ark_std start_timer/end_timer tracing
(reference src/main.rs:91-102, Cargo.toml:24 print-trace feature).
``phase`` prints wall-clock per phase and accumulates a report;
``device_trace`` wraps a block in a jax.profiler trace when a directory
is given (xprof-compatible).
"""

from __future__ import annotations

import contextlib
import time


class PhaseTimers:
    def __init__(self, verbose: bool = True):
        self.times: dict[str, float] = {}
        self.verbose = verbose

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            if self.verbose:
                print(f"[{name}] {dt:.3f}s", flush=True)

    def report(self) -> dict:
        return {k: round(v, 4) for k, v in self.times.items()}


@contextlib.contextmanager
def device_trace(trace_dir: str | None):
    """jax.profiler trace context; no-op when trace_dir is None."""
    if trace_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
