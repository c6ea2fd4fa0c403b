"""Observability: tensorboard scalars, running meters, phase timers, and
jax.profiler traces.

Capability target + upgrades: the reference's TensorboardLogger /
RunningMeter (pretrain_src utils/logger.py:27-90) and throughput counters
(train_r2r.py:299-316); the reference has no profiler integration
(SURVEY.md §5.1) — here `trace()` wraps jax.profiler for TPU timelines and
StepTimer splits host/sim time from device time per rollout step.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict, deque
from typing import Dict, Optional


class RunningMeter:
    """Exponential moving average of a scalar (utils/logger.py:68-90)."""

    def __init__(self, name: str, smooth: float = 0.99):
        self.name = name
        self.smooth = smooth
        self._val: Optional[float] = None

    def update(self, v: float):
        self._val = v if self._val is None else (
            self._val * self.smooth + v * (1 - self.smooth))

    @property
    def val(self) -> Optional[float]:
        return self._val


class TensorboardLogger:
    """Thin tensorboard writer; falls back to JSONL when tensorboard is
    unavailable so logs are never silently dropped."""

    def __init__(self, logdir: Optional[str]):
        self._tb = None
        self._jsonl = None
        self.step = 0
        if logdir:
            os.makedirs(logdir, exist_ok=True)
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(logdir)
            except ImportError:
                self._jsonl = open(os.path.join(logdir, "scalars.jsonl"),
                                   "a")

    def add_scalar(self, tag: str, value: float, step: Optional[int] = None):
        step = self.step if step is None else step
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        elif self._jsonl is not None:
            self._jsonl.write(json.dumps(
                {"tag": tag, "value": float(value), "step": step}) + "\n")

    def add_scalars(self, scalars: Dict[str, float],
                    step: Optional[int] = None):
        for k, v in scalars.items():
            self.add_scalar(k, v, step)

    def close(self):
        if self._tb is not None:
            self._tb.close()
        if self._jsonl is not None:
            self._jsonl.close()


class StepTimer:
    """Per-phase wall-clock accounting for the rollout loop (sim step vs
    device step vs graph update), with windowed means."""

    def __init__(self, window: int = 100):
        self._acc: Dict[str, deque] = defaultdict(
            lambda: deque(maxlen=window))

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._acc[name].append(time.perf_counter() - t0)

    def means(self) -> Dict[str, float]:
        return {k: sum(v) / len(v) for k, v in self._acc.items() if v}

    def reset(self):
        """Drop accumulated phases (e.g. to exclude compile warmup from
        a measurement window)."""
        self._acc.clear()


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context for TPU timeline capture
    (view with tensorboard / xprof)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
