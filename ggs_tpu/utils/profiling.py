"""Tracing / profiling hooks.

The reference's only observability is a tqdm postfix and an explicit
Triton-JIT prewarm (modules/utils.py:73-82, algorithm.py:162-163). Here:
`trace` wraps a region with jax.profiler (view in TensorBoard/XProf),
`named_scope` labels compiled regions, and StepTimer produces the
candidates/s throughput metric that BASELINE.md defines.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace around a block (no-op if log_dir is None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


named_scope = jax.named_scope


class StepTimer:
    """Wall-clock throughput: candidates (or steps) per second.

    Call start() after warmup/compilation, tick(n) after each synchronized
    block of n units, then rate().
    """

    def __init__(self) -> None:
        self._t0: Optional[float] = None
        self._units = 0

    def start(self) -> None:
        self._t0 = time.perf_counter()
        self._units = 0

    def tick(self, n: int = 1) -> None:
        self._units += n

    def elapsed(self) -> float:
        assert self._t0 is not None, "StepTimer.start() not called"
        return time.perf_counter() - self._t0

    def rate(self) -> float:
        dt = self.elapsed()
        return self._units / dt if dt > 0 else float("inf")


def prewarm(fn, *args, **kwargs):
    """Compile + run once and block, keeping JIT out of timings
    (the reference prewarms Triton the same way, modules/utils.py:73-82)."""
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return out
