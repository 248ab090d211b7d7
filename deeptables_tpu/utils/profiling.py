# -*- coding:utf-8 -*-
"""Profiling & tracing hooks.

The reference has no profiler integration — only coarse wall-clock logs
(SURVEY.md §5).  This module adds first-class JAX/TPU profiling:

- :func:`trace` — context manager around ``jax.profiler.trace`` writing a
  TensorBoard-compatible trace (XLA ops, TPU timeline);
- :class:`StepTimer` — lightweight rolling step-time/throughput stats for
  training loops (used by bench and available to callbacks);
- :func:`annotate` — named trace annotation for host-side phases.
"""

import contextlib
import time
from collections import deque

import numpy as np

from . import dt_logging

logger = dt_logging.get_logger(__name__)


@contextlib.contextmanager
def trace(logdir: str, with_memory: bool = True):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
        logger.info(f'profiler trace written to {logdir}')


def annotate(name: str):
    """Named annotation context for host-side phases inside a trace."""
    import jax
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling throughput statistics over training steps."""

    def __init__(self, window: int = 100):
        self.window = window
        self.times = deque(maxlen=window)
        self._last = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
        self._last = now

    @property
    def mean_step_time(self):
        return float(np.mean(self.times)) if self.times else float('nan')

    @property
    def p50(self):
        return float(np.median(self.times)) if self.times else float('nan')

    @property
    def p99(self):
        return float(np.percentile(self.times, 99)) if self.times \
            else float('nan')

    def throughput(self, batch_size: int):
        st = self.mean_step_time
        return batch_size / st if st and st > 0 else float('nan')

    def summary(self, batch_size: int = None):
        s = {'mean_step_s': self.mean_step_time, 'p50_s': self.p50,
             'p99_s': self.p99}
        if batch_size:
            s['examples_per_sec'] = self.throughput(batch_size)
        return s
