"""Profiling / timing: named scopes, xprof traces, wall-clock harness.

TPU counterpart of the reference's ``torch.autograd.profiler`` usage
(``model/DeepFMs.py:294,975-978``): ``jax.named_scope`` spans with the same
component names, ``jax.profiler.trace`` for a perfetto/xprof trace instead of
the chrome trace export, and a ``simple_timeit`` wall-clock harness with
device synchronization (the ``torch.cuda.Event`` analogue,
``model/DeepFMs.py:1012-1028``).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, List, Optional

import jax

# the reference's profiler span names (model/DeepFMs.py:294,340,351,362,365,395)
SCOPE_FM = "FM - Component"
SCOPE_FWLW = "FM FW LW"
SCOPE_OUTER_FM = "FM Outer FM"
SCOPE_OUTER_FWFM = "FM Outer FwFM"
SCOPE_SECOND_ORDER = "FM Second Order"
SCOPE_DEEP = "Deep - Component"


def named_scope(name: str):
    return jax.named_scope(name)


@contextlib.contextmanager
def trace(trace_dir: Optional[str]):
    """Capture an xprof trace (reference: ``export_chrome_trace('trace.json')``)."""
    if trace_dir is None:
        yield
        return
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def simple_timeit(fn: Callable, *args, tries: int = 10, warmup: int = 1,
                  task: str = "") -> float:
    """Mean wall-clock seconds per call, blocking on device completion."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times: List[float] = []
    for _ in range(tries):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return sum(times) / len(times)
