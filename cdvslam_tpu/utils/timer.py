"""Profiling timer (reference cdvslam/utils.py:8-29).

CUDA events become block_until_ready wall timing; jax.profiler traces can
be layered on via JAX_PROFILER env hooks.
"""
from __future__ import annotations

import time
from collections import defaultdict
from contextlib import ContextDecorator

ALL_TIMES = defaultdict(list)


class Timer(ContextDecorator):
    def __init__(self, name, enabled=True):
        self.name = name
        self.enabled = enabled

    def __enter__(self):
        if self.enabled:
            self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.enabled:
            ALL_TIMES[self.name].append(time.perf_counter() - self.start)
        return False
