"""Serving / benchmark harness: quality + profiler trace + latency sweep.

Parity surface of the reference's ``run_benchmark`` (``model/DeepFMs.py:947-1009``):

1. quality metrics over the test set (logloss/AUC/PRAUC/RCE);
2. a profiler pass with trace export (xprof instead of chrome-trace) PLUS an
   op-level summary table + device-memory accounting — the counterpart of the
   reference's ``prof.key_averages()`` printout with ``profile_memory=True``
   (``model/DeepFMs.py:975-978``);
3. batched forward timing (default batch 8192) → ms/batch and examples/s;
4. single-example latency (batch=1) over 1000 samples → mean ms.

Extends it TPU-natively with examples/s/chip. The fp32 vs int8 vs
compacted-pruned serving side-by-side lives in
``scripts/pruned_serving_bench.py`` (round-3 marginal on-chip timing over the
arms built from :mod:`.compaction` and :mod:`..compression.quantization`).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..train import metrics as M
from ..utils.profiling import simple_timeit, trace
from .predictor import Predictor


def memory_summary() -> Dict[str, float]:
    """Device (HBM) memory accounting — TPU counterpart of the reference's
    ``profile_memory=True`` autograd pass (``model/DeepFMs.py:975``).

    Returns ``{}`` on backends that expose no allocator stats (CPU)."""
    import jax

    stats = jax.local_devices()[0].memory_stats() or {}
    out = {}
    for key in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit",
                "largest_alloc_size"):
        if key in stats:
            out[key] = float(stats[key])
    return out


def op_summary(predictor: Predictor, bxi: np.ndarray, bxv: np.ndarray,
               log=print) -> Dict[str, float]:
    """Op-level summary of the compiled serving forward.

    Counterpart of ``prof.key_averages().table(sort_by='self_cpu_time_total')``
    (reference ``model/DeepFMs.py:975-978``), built TPU-natively from two
    sources:

    * XLA's compiled :meth:`cost_analysis` — analytic FLOPs / bytes-accessed
      of the whole fused program (XLA fuses aggressively, so per-HLO rows are
      not meaningful the way per-aten-op rows are on torch);
    * wall-clock timing of the forward's named components (the reference's
      ``record_function`` spans: lookup / interaction / deep tower), each
      jitted standalone — the fusion-boundary analogue of per-op self time.
    """
    import jax
    import jax.numpy as jnp

    results: Dict[str, float] = {}
    xi_d = jax.device_put(jnp.asarray(bxi, jnp.int32))
    xv_d = jax.device_put(jnp.asarray(bxv, jnp.float32))

    # --- XLA cost analysis of the full compiled forward --------------------
    try:
        cost = (predictor._fn.lower(predictor._model, xi_d, xv_d)
                .compile().cost_analysis())
        if isinstance(cost, (list, tuple)):   # older jax returns [dict]
            cost = cost[0] if cost else {}
        for key, out_key in (("flops", "flops_per_batch"),
                             ("bytes accessed", "bytes_accessed_per_batch")):
            if cost.get(key):
                results[out_key] = float(cost[key])
    except Exception:   # pragma: no cover - backend without cost analysis
        pass

    # --- per-component ON-CHIP marginal time (named-span analogue) ----------
    # round-3 protocol: marginal cost of one extra evaluation in a dispatch —
    # wall-clock per call through a remote tunnel is pure RTT for µs-scale
    # components. Replica inputs are rolled to defeat CSE.
    from ..utils.profiling import marginal_timeit

    import jax.numpy as jnp

    def _marg(fn, variants):
        return marginal_timeit(lambda m, *a: fn(m, *a), predictor._model,
                               variants, k2=len(variants), reps=5)

    def _rolled(arr, k=8):
        return [jnp.roll(arr, i, axis=0) for i in range(k)]

    rows: List[Tuple[str, float]] = []
    model = predictor._model
    if isinstance(model, dict):   # fp32 params: component sub-functions exist
        from ..models import deepfwfm
        from ..ops import embedding as emb_ops
        from ..ops import interactions as inter_ops
        from ..ops import mlp as mlp_ops

        cfg = predictor.cfg
        spec = deepfwfm.make_embedding_spec(cfg)
        b = bxi.shape[0]
        zero_rates = (0.0,) * (cfg.h_depth + 1)

        if "emb2" in model:
            from ..ops import superpack
            # pick the lookup matching the Predictor's chosen layout:
            # grouped (product default, round 5), super-row, or flat
            if "dense_groups" in model["emb2"]:
                lk = emb_ops.grouped_lookup_serving
            elif superpack.params_are_packed(model):
                lk = superpack.super_lookup
            else:
                lk = emb_ops.packed_lookup_serving
            f_lookup = lambda p, xi, xv: lk(p["emb2"], spec, xi, xv)
            rows.append(("Embedding lookup (packed gather)",
                         _marg(f_lookup, [(x, xv_d) for x in _rolled(xi_d)])))
            emb2_d = jax.device_put(np.asarray(jax.jit(f_lookup)(model, xi_d, xv_d)))
            if cfg.use_fwfm and "field_cov" in model:
                rows.append(("FwFM interaction (R-weighted pairs)",
                             _marg(lambda p, e: inter_ops.fwfm_second_order(
                                 e, p["field_cov"]),
                                 [(e,) for e in _rolled(emb2_d)])))
            elif cfg.use_fm:
                rows.append(("FM interaction (sum-of-squares)",
                             _marg(lambda p, e: inter_ops.fm_second_order(e),
                                   [(e,) for e in _rolled(emb2_d)])))
            if cfg.use_deep and "deep" in model:
                deep_in_d = jax.device_put(np.asarray(emb2_d).reshape(b, -1))
                rows.append(("Deep tower (MLP)",
                             _marg(lambda p, x: mlp_ops.mlp_forward(
                                 p["deep"]["net_1"], x, dropout_rates=zero_rates,
                                 train=False),
                                 [(x,) for x in _rolled(deep_in_d)])))

    rows.append(("Full forward",
                 _marg(predictor._fn, [(x, xv_d) for x in _rolled(xi_d)])))

    # --- render, reference-table style (sorted by self time desc) ----------
    log("\tOp-level summary (batch {}):".format(bxi.shape[0]))
    header = "\t  {:<38s} {:>12s} {:>10s}".format("component", "time (ms)", "share")
    log(header)
    total = rows[-1][1]
    for name, t in sorted(rows, key=lambda r: -r[1]):
        log("\t  {:<38s} {:>12.3f} {:>9.1f}%".format(
            name, t * 1e3, 100.0 * t / max(total, 1e-12)))
        results[f"component_ms/{name}"] = t * 1e3
    if "flops_per_batch" in results:
        log("\t  XLA cost analysis: {:.3f} GFLOP/batch, {:.1f} MB accessed/batch".format(
            results["flops_per_batch"] / 1e9,
            results.get("bytes_accessed_per_batch", 0.0) / 1e6))

    mem = memory_summary()
    if mem:
        log("\t  Device memory: {:.1f} MB in use, {:.1f} MB peak{}".format(
            mem.get("bytes_in_use", 0.0) / 1e6,
            mem.get("peak_bytes_in_use", 0.0) / 1e6,
            ", {:.0f} MB limit".format(mem["bytes_limit"] / 1e6)
            if "bytes_limit" in mem else ""))
        results.update({f"memory/{k}": v for k, v in mem.items()})
    else:
        log("\t  Device memory: no allocator stats on this backend")
    return results


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
    results.update(op_summary(predictor, bxi, bxv, log=log))

    # 3. batched forward timing (reference :982-997). Two numbers: wall clock
    # with a sync per call (includes host↔device round trips — the honest
    # "what a caller sees" figure) and ON-CHIP time — the MARGINAL cost of an
    # extra forward in one dispatch (round-3 protocol: RTT cancels,
    # device_get forces completion, matches steady-state streaming; a
    # scan-serialized chain overstates gather-heavy serving 3-4×).
    # Arrays are device-put once outside the timed lambda — the reference's
    # time_forward_pass also times only the forward, after tensor
    # construction (:1012-1028).
    from ..utils.profiling import marginal_timeit
    k2 = 8
    binputs = []
    for i in range(k2):
        sl = np.arange(i, i + batch_size) % n
        binputs.append((jax.device_put(jax.numpy.asarray(Xi[sl] if n >= batch_size else bxi)),
                        jax.device_put(jax.numpy.asarray(Xv[sl] if n >= batch_size else bxv))))
    bxi_d, bxv_d = binputs[0]
    t_batch = simple_timeit(lambda: predictor._fn(predictor._model, bxi_d, bxv_d), tries=20)
    t_chip = marginal_timeit(predictor._fn, predictor._model, binputs, k2=k2, reps=5)
    results["batch_ms"] = t_batch * 1e3
    results["batch_onchip_ms"] = t_chip * 1e3
    results["examples_per_s"] = batch_size / t_chip
    results["examples_per_s_per_chip"] = results["examples_per_s"] / max(jax.device_count(), 1)
    log("\tAvg forward pass time per batch (ms):\t{:.3f} wall / {:.3f} on-chip".format(
        results["batch_ms"], results["batch_onchip_ms"]))
    log("\tThroughput (examples/s, on-chip):\t{:.0f}".format(results["examples_per_s"]))
    log("\tThroughput (examples/s/chip):\t{:.0f}".format(results["examples_per_s_per_chip"]))

    # 4. single-example latency (reference :999-1009) — wall + on-chip.
    # Single-request latency is inherently serialized, so the scan-chained
    # protocol is the right semantics here (and the marginal slope of a
    # ~100 µs op drowns in dispatch jitter).
    from ..utils.profiling import scan_timeit
    xi1 = jax.numpy.asarray(Xi[:1])
    xv1 = jax.numpy.asarray(Xv[:1])
    t_single = simple_timeit(lambda: predictor._fn(predictor._model, xi1, xv1),
                             tries=min(n_single, 1000), warmup=3)
    t1_chip = scan_timeit(predictor._fn, predictor._model, xi1, xv1,
                          iters=min(n_single, 1000), reps=3)
    results["single_example_ms"] = t_single * 1e3
    results["single_example_onchip_ms"] = t1_chip * 1e3
    log("\tAvg forward pass time (ms):\t{:.3f} wall / {:.3f} on-chip".format(
        results["single_example_ms"], results["single_example_onchip_ms"]))
    return results
