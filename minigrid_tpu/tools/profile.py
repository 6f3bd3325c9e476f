"""Profiling / tracing utilities.

The reference's only performance tooling is wall-clock FPS printing
(benchmark.py:~15-70). Here the equivalents are TPU-native:

  * `trace(...)` — context manager around `jax.profiler` producing a
    perfetto/tensorboard trace directory for any jitted region.
  * `timed_steps_per_sec(...)` — `block_until_ready`-fenced throughput
    measurement of an arbitrary rollout callable.
  * `annotate(...)` — named trace region (shows up in the perfetto
    timeline) for attributing time inside a host loop.

Usage:
    from minigrid_tpu.tools.profile import trace, timed_steps_per_sec
    with trace("/tmp/mg_trace"):
        states, metrics = rollout(key, states)
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a device+host profiler trace of the enclosed region."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside an active trace (host-side annotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def timed_steps_per_sec(
    fn: Callable,
    *args,
    steps_per_call: int,
    iters: int = 5,
    warmup: int = 1,
    fence: Optional[Callable] = None,
) -> float:
    """Best-of-`iters` steps/s of `fn(*args)`.

    `fence(result)` must force full materialization (defaults to
    `jax.block_until_ready`); `steps_per_call` is the number of env steps
    one call simulates (batch × scan length).
    """
    fence = fence or jax.block_until_ready
    for _ in range(warmup):
        fence(fn(*args))
    best = 0.0
    for _ in range(iters):
        t0 = time.perf_counter()
        fence(fn(*args))
        dt = time.perf_counter() - t0
        best = max(best, steps_per_call / dt)
    return best
