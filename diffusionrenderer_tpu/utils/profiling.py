"""Tracing / profiling / metrics — first-class observability.

The reference has none of this (SURVEY.md section 5: print statements and a
ComfyUI ProgressBar only).  Here:

* `trace(dir)` — context manager around jax.profiler.trace; view the result
  in TensorBoard / Perfetto;
* `annotate(name)` — TraceAnnotation so pipeline phases (condition-encode,
  denoise, decode) are labeled inside device traces;
* `Timer` / `phase_timer` — wall-clock phase timers with a metrics registry;
* `device_get_scalar` — the only reliable way to measure completion through
  the axon tunnel (block_until_ready is a no-op there; see BASELINE.md).
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Iterator, List

import jax
import numpy as np

logger = logging.getLogger("diffusionrenderer_tpu")


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device+host profile into log_dir."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Label a region inside a jitted computation's trace."""
    return jax.profiler.TraceAnnotation(name)


def device_get_scalar(x) -> float:
    """Force execution + fetch one element (tunnel-safe completion)."""
    return float(np.asarray(x.reshape(-1)[-1]))


class MetricsRegistry:
    """Process-wide phase timing aggregation."""

    def __init__(self):
        self._times: Dict[str, List[float]] = defaultdict(list)

    def record(self, name: str, seconds: float) -> None:
        self._times[name].append(seconds)
        logger.debug("phase %s: %.3fs", name, seconds)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, vals in self._times.items():
            arr = np.asarray(vals)
            out[name] = {
                "count": int(arr.size),
                "total_s": float(arr.sum()),
                "mean_s": float(arr.mean()),
                "min_s": float(arr.min()),
                "max_s": float(arr.max()),
            }
        return out

    def reset(self) -> None:
        self._times.clear()


metrics = MetricsRegistry()


@contextlib.contextmanager
def phase_timer(name: str, registry: MetricsRegistry = metrics) -> Iterator[None]:
    t0 = time.perf_counter()
    try:
        yield
    finally:
        registry.record(name, time.perf_counter() - t0)


class Timer:
    """Reusable named timer: `with Timer('decode') as t: ...; t.seconds`."""

    def __init__(self, name: str = "timer"):
        self.name = name
        self.seconds = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self._t0
        metrics.record(self.name, self.seconds)
        return False
