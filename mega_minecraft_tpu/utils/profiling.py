"""Profiling / metrics: per-stage timers, FPS counter, XLA trace hooks.

The reference has no tracing framework — an FPS title-bar counter
(/root/reference/src/main.cpp:124-160, StepTimer main.hpp:35-164) and a wall-clock
stopwatch on initial generation (DEBUG_TIME_CHUNK_FILL, terrain.cpp:939-959) are its
only instruments.  The TPU build needs real counters (BASELINE.md metrics:
chunks/sec, Mrays/sec, ms/frame) plus `jax.profiler` traces for XLA-level analysis.

Measurement gotcha on linked-TPU backends: ``block_until_ready`` may only cover
dispatch; timers that must include device execution should force a host transfer of
a small output (``np.asarray``) — ``StageTimer.sync`` does this when given an array.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from dataclasses import dataclass, field

import numpy as np


class StageTimer:
    """Accumulates wall time + item counts per named stage.

    >>> timer = StageTimer()
    >>> with timer.stage("fill", items=16):
    ...     run_fill()
    >>> timer.report()["fill"]["items_per_s"]
    """

    def __init__(self):
        self.total_s = defaultdict(float)
        self.calls = defaultdict(int)
        self.items = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, items: int = 0, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                np.asarray(sync)  # force host transfer => device completion
            self.total_s[name] += time.perf_counter() - t0
            self.calls[name] += 1
            self.items[name] += items

    def report(self) -> dict:
        out = {}
        for name, s in sorted(self.total_s.items(), key=lambda kv: -kv[1]):
            out[name] = {
                "seconds": round(s, 4),
                "calls": self.calls[name],
                "items": self.items[name],
                "items_per_s": round(self.items[name] / s, 2) if s > 0 else 0.0,
            }
        return out

    def dump(self) -> str:
        return json.dumps(self.report(), indent=2)

    def reset(self):
        self.total_s.clear()
        self.calls.clear()
        self.items.clear()


@dataclass
class FpsCounter:
    """Frame timer + rolling FPS (the StepTimer/title-bar analogue)."""

    window: float = 1.0
    _t_last: float = field(default_factory=time.perf_counter)
    _acc: float = 0.0
    _frames: int = 0
    fps: float = 0.0
    last_dt: float = 0.0

    def tick(self) -> float:
        """Call once per frame; returns dt seconds since the previous tick."""
        now = time.perf_counter()
        self.last_dt = now - self._t_last
        self._t_last = now
        self._acc += self.last_dt
        self._frames += 1
        if self._acc >= self.window:
            self.fps = self._frames / self._acc
            self._acc = 0.0
            self._frames = 0
        return self.last_dt


@contextlib.contextmanager
def xla_trace(log_dir: str = "/tmp/mmtpu_trace"):
    """``jax.profiler`` trace scope (view with tensorboard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def mrays_per_s(width: int, height: int, frames: int, seconds: float, rays_per_pixel: float = 1.0) -> float:
    return width * height * frames * rays_per_pixel / seconds / 1e6
