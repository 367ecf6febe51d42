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
    """Capture an xprof trace (reference: ``export_chrome_trace('trace.json')``).

    Degrades to a no-op (with a warning) on backends without profiler support
    (e.g. remote-tunneled devices).
    """
    if trace_dir is None:
        yield
        return
    try:
        jax.profiler.start_trace(trace_dir)
    except Exception as e:  # backend without profiler support
        import warnings
        warnings.warn(f"jax.profiler unavailable on this backend: {e}")
        yield
        return
    try:
        yield
    finally:
        try:
            jax.profiler.stop_trace()
        except Exception:
            pass


def simple_timeit(fn: Callable, *args, tries: int = 10, warmup: int = 1,
                  task: str = "") -> float:
    """Mean wall-clock seconds per call, blocking on device completion.

    Completion is forced by fetching one element of the result
    (``jax.device_get``), not ``block_until_ready`` — see ``scan_timeit`` for
    the remote-platform failure mode this avoids. Wall-clock through a remote
    tunnel includes the dispatch RTT; use ``scan_timeit`` for on-chip time.
    """
    def _force(out):
        leaves = jax.tree.leaves(out)
        if leaves:
            leaf = leaves[0]
            jax.device_get(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf)

    for _ in range(warmup):
        _force(fn(*args))
    times: List[float] = []
    for _ in range(tries):
        t0 = time.perf_counter()
        _force(fn(*args))
        times.append(time.perf_counter() - t0)
    return sum(times) / len(times)


def marginal_timeit(fn: Callable, model, inputs, *, k1: int = 1, k2: int = 16,
                    reps: int = 7) -> float:
    """ON-CHIP seconds per forward, straight-line regime: the MARGINAL cost
    of one extra forward in a single dispatch.

    ``inputs`` is a list of ≥ ``k2`` DISTINCT ``(xi, xv)`` tuples (distinct
    inputs defeat CSE; the summed scalar output defeats DCE; the dispatch RTT
    cancels in the subtraction; ``jax.device_get`` forces completion). This
    matches steady-state streaming serving — use it for serving numbers;
    ``scan_timeit`` serializes through a carry and is the honest shape for
    the (lax.scan-based) TRAINING dispatch, but TPU gathers run ~3-4× slower
    inside a scan body, so it overstates out-of-scan serving cost.
    """
    import jax.numpy as jnp

    def mk(k):
        @jax.jit
        def run(model, args_list):
            tot = jnp.float32(0.0)
            for a in args_list:
                tot = tot + jnp.sum(fn(model, *a).astype(jnp.float32))
            return tot
        return run

    # a short list would silently run len(inputs) forwards while dividing by
    # k2-k1 — a ~4× throughput inflation caught in the round-5 batch sweep
    assert len(inputs) >= k2 > k1, \
        f"marginal_timeit needs >= k2={k2} distinct inputs, got {len(inputs)}"
    r1, r2 = mk(k1), mk(k2)
    jax.device_get(r1(model, inputs[:k1]))
    jax.device_get(r2(model, inputs[:k2]))
    t1s: List[float] = []
    t2s: List[float] = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(r1(model, inputs[:k1]))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.device_get(r2(model, inputs[:k2]))
        t2s.append(time.perf_counter() - t0)
    return (min(t2s) - min(t1s)) / (k2 - k1)


def scan_timeit(fn: Callable, model, xi, xv, *, iters: int = 100,
                reps: int = 3, warmup: bool = True) -> float:
    """ON-CHIP seconds per forward: chain ``iters`` forwards in ONE dispatch.

    ``simple_timeit`` pays one host↔device round trip per measurement, which
    on remote-attached chips (tunnel RTT ≫ kernel time) measures the link,
    not the chip — and a pipelined loop measures only enqueue rate, which is
    how a round-2 benchmark reported 119% of the v5e's bf16 peak (VERDICT r2
    weak #1). Here ``lax.scan`` runs the forwards back-to-back on device:

    * a scalar CARRY derived from each step's logits feeds the next step's
      ``xv`` (scaled by 1e-30, numerically invisible) — a data dependency XLA
      cannot CSE away;
    * per-step int32/f32 offsets from the scan xs are added to ``xi``/``xv``
      (zeros at runtime, unknown at trace time) — so the gathers are not
      loop-invariant and cannot be hoisted.

    One dispatch = one RTT amortized over ``iters`` forwards; the MEDIAN of
    ``reps`` dispatches divided by ``iters`` is the per-forward time. The
    number is a *throughput* per-batch time (the chip pipelines nothing
    across scan steps — each step consumes the previous carry).

    Completion is forced with ``jax.device_get`` of the scalar carry, NOT
    ``block_until_ready``: on the remote-attached ('axon') platform
    ``block_until_ready`` can return before on-chip execution finishes (a
    100-step scan "completed" in 0.26 ms while fetching its result took
    961 ms — round 3 measurement), which is exactly the failure mode that
    produced the impossible round-2 headline. A D2H fetch of the scalar
    cannot complete before the value exists.
    """
    import jax.numpy as jnp

    offs = jnp.zeros((iters,), jnp.int32)
    foffs = jnp.zeros((iters,), jnp.float32)

    @jax.jit
    def run(model, xi, xv, offs, foffs):
        def body(carry, of):
            o, f = of
            out = fn(model, xi + o, xv + (f + carry))
            return jnp.mean(out) * jnp.float32(1e-30), None
        carry, _ = jax.lax.scan(body, jnp.float32(0.0), (offs, foffs))
        return carry

    if warmup:
        jax.device_get(run(model, xi, xv, offs, foffs))
    times: List[float] = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(run(model, xi, xv, offs, foffs))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2] / iters
