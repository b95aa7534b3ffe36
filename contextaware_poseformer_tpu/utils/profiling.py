"""Profiling & timing utilities.

The reference has no profiler integration (SURVEY.md section 5: thop imported
but unused, wall-clock epoch prints only). Here:
- `trace(logdir)`: context manager around jax.profiler (TensorBoard-viewable
  traces; tensorboard-plugin-profile ships in this image);
- `StepWindowProfiler`: start/stop around a step window inside a training
  loop (profile steps [start, stop) of an epoch);
- `sustained_timer`: the measurement protocol that is actually trustworthy on
  shared/tunneled TPU backends — distinct inputs per iteration + a final
  device->host fetch (repeated identical dispatches get cached and
  block_until_ready may return at enqueue; see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepWindowProfiler:
    """Profile steps [start, stop) of a loop: call .step() once per step."""

    def __init__(self, logdir: str, start: int, stop: int):
        self.logdir = logdir
        self.start = start
        self.stop = stop
        self._count = 0
        self._active = False

    def step(self) -> None:
        if self._count == self.start and not self._active:
            jax.profiler.start_trace(self.logdir)
            self._active = True
        self._count += 1
        if self._count == self.stop and self._active:
            jax.profiler.stop_trace()
            self._active = False

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


def sustained_timer(
    fn: Callable,
    make_args: Callable[[int], tuple],
    iters: int = 20,
    bursts: int = 3,
) -> dict[str, float]:
    """Peak sustained seconds/iteration of `fn` across bursts.

    `make_args(i)` must return args that differ per i (defeats dispatch
    caching); the burst ends with a host fetch of one output element (defeats
    enqueue-time completion signals).
    """
    out = fn(*make_args(0))
    jax.block_until_ready(out)
    best = float("inf")
    salt = 0
    for _ in range(bursts):
        t0 = time.perf_counter()
        for _ in range(iters):
            salt += 1
            out = fn(*make_args(salt))
        leaf = jax.tree.leaves(out)[0]
        _ = np.asarray(jax.device_get(leaf))[(0,) * leaf.ndim]
        best = min(best, (time.perf_counter() - t0) / iters)
    return {"sec_per_iter": best, "iters_per_sec": 1.0 / best}
