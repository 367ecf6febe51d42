#!/usr/bin/env python
"""Reconcile the int8-vs-f32 serving-gather tension (VERDICT r4 weak #1).

The r4 knee table (RECALIBRATE_r4.json) measured int8 rows gathering at
1.8-2.6 ns/row "with no knee through 512 KB", while the end-to-end int8
serving arm runs at fp32 PARITY (RESULTS.md "Serving precision comparison").
Hypothesis: the knee is positioned in PER-LANE-COLUMN bytes (~1 MB measured
for f32); the full-Criteo int8 table is N=1.33M rows × 1 B/lane ≈ 1.33 MB per
lane column — just PAST the knee, so the fast path the 512 KB micro-table hit
does not apply at product scale, and the per-row line-fetch floor is
dtype-independent there.

Protocol: marginal (out-of-scan, straight-line — the serving regime), 16
distinct (B=8192 × F=26) per-field-distributed index sets, completion forced
by device_get (block_until_ready lies on this platform). Sweep table size
N/div for div ∈ {16, 8, 4, 2, 1} for BOTH dtypes; also split fetch vs dequant
for int8 (raw int32-sum of the gathered lines vs full unpack+dequant).

Decision rule printed at the end: if full-table int8 gathers ≥ 1.7× faster
than f32, an int8 serving headline arm (>7M ex/s) is warranted; otherwise the
knee explanation stands and the parity arm is already optimal.

Reference counterpart: the serving lookup this isolates is the dominant 85%
of the batch-8192 forward (RESULTS.md "On-chip forward breakdown");
``model/DeepFMs.py:296,311`` is the reference's per-field loop equivalent.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from synthetic_scale_run import FULL_CRITEO_CAT_SIZES  # noqa: E402

B = 8192
F = 26
E = 10
REPS = 7
K2 = 16


def main():
    import jax
    import jax.numpy as jnp

    from xsdeepfwfm_deprecated_tpu.ops.quantized import unpack_qs
    from xsdeepfwfm_deprecated_tpu.utils import enable_compilation_cache
    from xsdeepfwfm_deprecated_tpu.utils.profiling import marginal_timeit

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    sizes = np.asarray(FULL_CRITEO_CAT_SIZES)
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    n_rows = int(sizes.sum())
    rows_per_call = B * F

    # distinct per-field-distributed index sets (uniform within each field —
    # the serving benchmark's distribution; uniform-over-the-whole-table
    # gathers ~5× slower and is NOT the serving shape, memory r3)
    idx_sets = []
    for _ in range(K2):
        xi = (rng.random((B, F)) * sizes).astype(np.int64) + offsets
        idx_sets.append(xi.reshape(-1).astype(np.int32))

    table_f32 = jnp.asarray(rng.normal(size=(n_rows, E)).astype(np.float32))
    # int8 inline-scale rows (ops/quantized.quantize_embedding_rows layout)
    q = rng.integers(-127, 128, size=(n_rows, E), dtype=np.int8)
    sc = rng.random((n_rows, 4)).astype(np.float32).view(np.int8)[:, :4]
    table_qs = jnp.asarray(np.concatenate([q, sc.astype(np.int8)], axis=1))

    def f32_gather(tab, idx):
        return jnp.sum(jnp.take(tab, idx, axis=0))

    def int8_raw(tab, idx):
        # fetch-only: int32 sum of the gathered lines, no dequant
        return jnp.sum(jnp.take(tab, idx, axis=0).astype(jnp.int32))

    def int8_deq(tab, idx):
        vals, scales = unpack_qs(jnp.take(tab, idx, axis=0))
        return jnp.sum(vals * scales)

    out = {"rows_per_call": rows_per_call, "sweep": []}
    for div in (16, 8, 4, 2, 1):
        n = n_rows // div
        tf = table_f32[:n]
        tq = table_qs[:n]
        inputs = [(jnp.asarray(ix % n),) for ix in idx_sets]
        row = {"div": div, "n_rows": n,
               "f32_lane_mb": round(n * 4 / 1e6, 2),
               "int8_lane_mb": round(n * 1 / 1e6, 2)}
        for name, fn, tab in (("f32", f32_gather, tf),
                              ("int8_raw", int8_raw, tq),
                              ("int8_deq", int8_deq, tq)):
            t = marginal_timeit(fn, tab, inputs, reps=REPS)
            row[f"{name}_ms"] = round(t * 1e3, 3)
            row[f"{name}_ns_per_row"] = round(t * 1e9 / rows_per_call, 2)
        print(json.dumps(row), flush=True)
        out["sweep"].append(row)

    full = out["sweep"][-1]
    ratio = full["f32_ns_per_row"] / max(full["int8_deq_ns_per_row"], 1e-9)
    out["full_table_f32_over_int8"] = round(ratio, 2)
    if ratio >= 1.7:
        out["decision"] = ("int8 gathers materially faster at full scale — "
                           "build the int8 headline serving arm")
    else:
        small = out["sweep"][0]
        out["decision"] = (
            "parity confirmed at full scale (ratio %.2f); int8 fast-rate only "
            "holds below the per-lane knee (N/16 int8: %.2f ns/row vs full: "
            "%.2f) — the knee-table int8 rows came from sub-knee tables and "
            "do not transfer; per-row line fetch dominates past the knee"
            % (ratio, small["int8_deq_ns_per_row"], full["int8_deq_ns_per_row"]))
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"total {time.time()-t0:.0f}s")
