"""Metering utilities.

Parity target: `/root/reference/yolox/utils/metric.py:51-123`
(`AverageMeter` windowed deque + `MeterBuffer`), plus device-memory
introspection (`gpu_mem_usage:43` becomes TPU HBM stats via
``device.memory_stats()``; the CUDA ``occupy_mem`` pre-allocation trick has
no TPU equivalent — XLA preallocates HBM by default).
"""

from __future__ import annotations

import functools
from collections import defaultdict, deque
from typing import Optional

import numpy as np


def device_mem_usage(device=None) -> float:
    """Bytes in use on the accelerator, in MB (ref `gpu_mem_usage`)."""
    import jax

    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    if not stats:
        return 0.0
    return stats.get("bytes_in_use", 0) / (1024 * 1024)


class AverageMeter:
    """Track a series of values with a window (ref `AverageMeter:51-98`)."""

    def __init__(self, window_size: int = 50):
        self._deque = deque(maxlen=window_size)
        self._total = 0.0
        self._count = 0

    def update(self, value):
        self._deque.append(value)
        self._count += 1
        self._total += value

    @property
    def median(self):
        d = np.array(self._deque)
        return np.median(d) if len(d) else 0.0

    @property
    def avg(self):
        d = np.array(self._deque)
        return d.mean() if len(d) else 0.0

    @property
    def global_avg(self):
        return self._total / max(self._count, 1e-5)

    @property
    def latest(self):
        return self._deque[-1] if len(self._deque) > 0 else None

    @property
    def total(self):
        return self._total

    def reset(self):
        self._deque.clear()
        self._total = 0.0
        self._count = 0

    def clear(self):
        self._deque.clear()


class MeterBuffer(defaultdict):
    """Dict of AverageMeters with key filtering (ref `MeterBuffer:101-123`)."""

    def __init__(self, window_size: int = 20):
        factory = functools.partial(AverageMeter, window_size=window_size)
        super().__init__(factory)

    def reset(self):
        for v in self.values():
            v.reset()

    def get_filtered_meter(self, filter_key: str = "time"):
        return {k: v for k, v in self.items() if filter_key in k}

    def update(self, values: Optional[dict] = None, **kwargs):
        if values is None:
            values = {}
        values.update(kwargs)
        for k, v in values.items():
            self[k].update(float(v))

    def clear_meters(self):
        for v in self.values():
            v.clear()


class CandidateDropMonitor:
    """Rate-limited warning when SimOTA candidate compaction sheds anchors.

    Compaction (``SimOTAConfig.cand_cap > 0``) is bit-exact while the
    candidate superset fits the capacity; on overflow it sheds only
    low-priority padded-AABB anchors — but shed anchors are legitimately
    matchable, so assignment may then diverge from the reference's
    full-lattice SimOTA.  A TB scalar alone is easy to miss; this surfaces
    a ``logger.warning`` at most once per ``window`` steps while drops
    persist.  Reference-exact training requires ``cand_cap=0``.
    """

    def __init__(self, log, window: int = 50):
        self._log = log
        self._window = window
        self._steps = 0
        self._dropped = 0

    def update(self, dropped) -> None:
        self._steps += 1
        self._dropped += int(dropped)
        if self._steps >= self._window:
            if self._dropped:
                self._log.warning(
                    "SimOTA compaction shed %d candidate anchors over the "
                    "last %d steps — assignment may diverge from the "
                    "reference's full-lattice SimOTA; set cand_cap=0 "
                    "(full-lattice path) for reference-exact training",
                    self._dropped, self._steps,
                )
            self._steps = 0
            self._dropped = 0
