"""Serving / benchmark harness: quality + profiler trace + latency sweep.

Parity surface of the reference's ``run_benchmark`` (``model/DeepFMs.py:947-1009``):

1. quality metrics over the test set (logloss/AUC/PRAUC/RCE);
2. a profiler pass with trace export (xprof instead of chrome-trace);
3. batched forward timing (default batch 8192) → ms/batch and examples/s;
4. single-example latency (batch=1) over 1000 samples → mean ms.

Extends it TPU-natively with examples/s/chip and an optional side-by-side of
fp32 vs int8 vs pruned-masked serving paths.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..train import metrics as M
from ..utils.profiling import simple_timeit, trace
from .predictor import Predictor


def run_benchmark(predictor: Predictor, Xi, Xv, y, *, batch_size: int = 8192,
                  trace_dir: Optional[str] = None, logger=None,
                  n_single: int = 1000) -> Dict[str, float]:
    """Full benchmark; returns a dict of every measured number."""
    import jax

    log = (logger.info if logger is not None else print)
    Xi = np.asarray(Xi, np.int32).reshape(-1, predictor.cfg.num_categorical)
    Xv = np.asarray(Xv, np.float32)
    y = np.asarray(y, np.float64).ravel()
    n = Xi.shape[0]
    results: Dict[str, float] = {}

    # 1. quality (reference :953-957)
    logits = []
    for lo in range(0, n, batch_size):
        sl = slice(lo, min(n, lo + batch_size))
        logits.append(predictor.logits(Xi[sl], Xv[sl]))
    logits = np.concatenate(logits).astype(np.float64)
    pred = 1.0 / (1.0 + np.exp(-logits))
    results["loss"] = M.bce_logits_sum(y, logits) / max(n, 1)
    results["auc"] = M.roc_auc(y, pred)
    results["prauc"] = M.prauc(pred, y)
    results["rce"] = M.rce(pred, y)
    log(f"\tLoss: {results['loss']}")
    log(f"\tAcc: {results['auc']}")
    log(f"\tPRAUC: {results['prauc']}")
    log(f"\tRCE: {results['rce']}")

    # 2. profiler pass with trace export (reference :975-978)
    bxi, bxv = Xi[:batch_size], Xv[:batch_size]
    if bxi.shape[0] < batch_size:   # pad for a full batch
        reps = -(-batch_size // max(bxi.shape[0], 1))
        bxi = np.tile(bxi, (reps, 1))[:batch_size]
        bxv = np.tile(bxv, (reps, 1))[:batch_size]
    predictor.warmup(batch_sizes=(1, batch_size))
    with trace(trace_dir):
        predictor.logits(bxi, bxv)

    # 3. batched forward timing (reference :982-997). Arrays are device-put
    # once outside the timed lambda — the reference's time_forward_pass also
    # times only the forward, after tensor construction (:1012-1028).
    bxi_d = jax.device_put(jax.numpy.asarray(bxi))
    bxv_d = jax.device_put(jax.numpy.asarray(bxv))
    t_batch = simple_timeit(lambda: predictor._fn(predictor._model, bxi_d, bxv_d), tries=20)
    results["batch_ms"] = t_batch * 1e3
    results["examples_per_s"] = batch_size / t_batch
    results["examples_per_s_per_chip"] = results["examples_per_s"] / max(jax.device_count(), 1)
    log("\tAvg forward pass time per batch (ms):\t{:.3f}".format(results["batch_ms"]))
    log("\tThroughput (examples/s):\t{:.0f}".format(results["examples_per_s"]))
    log("\tThroughput (examples/s/chip):\t{:.0f}".format(results["examples_per_s_per_chip"]))

    # 4. single-example latency (reference :999-1009)
    xi1 = jax.numpy.asarray(Xi[:1])
    xv1 = jax.numpy.asarray(Xv[:1])
    t_single = simple_timeit(lambda: predictor._fn(predictor._model, xi1, xv1),
                             tries=min(n_single, 1000), warmup=3)
    results["single_example_ms"] = t_single * 1e3
    log("\tAvg forward pass time (ms):\t{:.3f}".format(results["single_example_ms"]))
    return results
