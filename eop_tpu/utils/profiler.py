"""Profiling / tracing hooks.

The reference's observability is thop FLOPs + host timers (SURVEY §5);
the TPU-native equivalents are XLA cost analysis (see
`model_utils.get_model_info`) and `jax.profiler` device traces, wrapped
here for trainer/CLI use:

    with trace("/tmp/eop_trace"):
        state, metrics = train_step(...)
    # then: tensorboard --logdir /tmp/eop_trace  (trace viewer)
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard's trace viewer."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a trace (shows up on the timeline)."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Rolling step timer that forces a device sync per report interval."""

    def __init__(self, interval: int = 50):
        self.interval = interval
        self._count = 0
        self._start: Optional[float] = None

    def tick(self, sync_handle=None) -> Optional[float]:
        """Returns steps/sec every ``interval`` calls, else None."""
        if self._start is None:
            self._start = time.perf_counter()
            self._count = 0
            return None
        self._count += 1
        if self._count % self.interval == 0:
            if sync_handle is not None:
                from ..parallel.dist import wait_device

                wait_device(sync_handle)
            now = time.perf_counter()
            rate = self.interval / (now - self._start)
            self._start = now
            self._count = 0
            return rate
        return None
