"""Benchmark harness — prints ONE JSON line (stdout) for the driver.

Metric: batched serving throughput (examples/s) of the PAPER-SCALE dense
DeepFwFM forward — the full-Criteo model from the reference's latency study
(``/root/reference/latency/criteo_latency.cpp:31-39``: 39 fields, 1.33M
features with the real per-field cardinalities, embedding 10, 400^3 deep
tower, lw+fwlw), batch 8192. The 53MB emb2 table exceeds VMEM, so the
gathers hit HBM — this is the workload the baseline describes, not a
VMEM-resident toy.

Baseline: the reference's own measured 8192-batch CPU forward for this same
architecture — 1299.191 ms/batch single-thread (``data/results/criteo.md:5``,
BASELINE.md) → 6305 examples/s. ``vs_baseline`` = ours / reference.

Protocol (round 3, fixing the round-2 physics failure — VERDICT r2 weak #1):
the HEADLINE number is ON-CHIP time from ``scan_timeit``: 100 forwards
chained in ONE dispatch through a ``lax.scan`` whose carry feeds each step's
inputs (no CSE, no hoisting), median of 5 dispatches → ≥500 timed forwards
with 5 RTTs total. The round-2 protocol (pipelined dispatch loop, one
``block_until_ready`` per 20 enqueues) measured the host's ENQUEUE rate
through the remote-attachment tunnel whenever the enqueue stream outran the
chip, reporting 237.9M ex/s = 119% of the v5e bf16 peak — physically
impossible. The pipelined wall-clock is still reported (stderr) as a
cross-check; the roofline guard marks the JSON invalid if achieved FLOP/s
exceeds the chip's peak.
"""

import json
import sys

import numpy as np

# v5e single-chip peaks (public spec): 197 TFLOP/s bf16, 819 GB/s HBM.
V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_HBM_BYTES = 819e9


def flops_per_example(cfg) -> float:
    """Analytic dense forward FLOPs per example (MACs×2, fp32 model).

    Deep tower: (F·E)→N, (h_depth-1)×N→N, N→1. FwFM: pairwise inner products
    F²·E MACs (computed as emb @ emb^T) + R weighting. Lookups are gathers
    (0 FLOP). Matches XLA cost analysis within a few %.
    """
    F, E, N = cfg.field_size, cfg.embedding_size, cfg.deep_nodes
    deep = 2 * (F * E * N + (cfg.h_depth - 1) * N * N + N)
    fwfm = 2 * F * F * E + 2 * F * F   # pair dot-products + R mask-sum
    lw = 2 * F                          # first-order dot
    return float(deep + fwfm + lw)


def gather_bytes_per_example(cfg) -> float:
    """HBM gather traffic per example: emb2 (F rows × E fp32) + emb1 (F fp32).
    Dense weights are batch-amortized and mostly VMEM-resident; this is the
    per-example irreducible HBM read."""
    F, E = cfg.field_size, cfg.embedding_size
    return F * E * 4.0 + F * 4.0


def main():
    import time

    import jax

    from xsdeepfwfm_deprecated_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from __graft_entry__ import _flagship
    from xsdeepfwfm_deprecated_tpu.models import deepfwfm
    from xsdeepfwfm_deprecated_tpu.utils.profiling import scan_timeit

    cfg = _flagship(full_criteo=True)
    params = deepfwfm.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    b = 8192
    xi = np.ascontiguousarray(
        rng.integers(0, [s for s in cfg.feature_sizes[13:]], size=(b, 26)).astype(np.int32))
    xv = rng.normal(size=(b, 13)).astype(np.float32)

    fwd = jax.jit(lambda p, a, v: deepfwfm.forward(p, a, v, cfg))
    xi_d, xv_d = jax.device_put(xi), jax.device_put(xv)
    params = jax.device_put(params)
    jax.block_until_ready(fwd(params, xi_d, xv_d))   # compile

    # --- headline: ON-CHIP per-forward time (serialized scan, 5×100 fwds) ---
    dt_chip = scan_timeit(fwd, params, xi_d, xv_d, iters=100, reps=5)

    # --- cross-check: the round-2 pipelined wall clock (enqueue-bound on a
    # tunnel; kept to quantify how wrong it is on this link) ----------------
    reps, iters = 3, 50
    wall = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(params, xi_d, xv_d)
        jax.block_until_ready(out)
        wall.append((time.perf_counter() - t0) / iters)
    dt_wall = sorted(wall)[len(wall) // 2]

    examples_per_s = b / dt_chip
    baseline = 8192 / 1.299191  # reference 8192-batch 1-thread CPU ms → ex/s

    # roofline + sanity guard
    fpe = flops_per_example(cfg)
    bpe = gather_bytes_per_example(cfg)
    ach_flops = examples_per_s * fpe
    ach_gather = examples_per_s * bpe
    roofline_ok = ach_flops <= V5E_PEAK_BF16_FLOPS
    emb_mb = sum(cfg.feature_sizes) * cfg.embedding_size * 4 / 1e6
    print(f"roofline: model=criteo-full ({sum(cfg.feature_sizes):,} features, "
          f"emb2 {emb_mb:.0f} MB > VMEM)\n"
          f"  {fpe / 1e6:.3f} MFLOP/ex, {bpe:.0f} B/ex gather\n"
          f"  on-chip {dt_chip * 1e3:.3f} ms/batch (scan-serialized, 500 fwds) "
          f"vs pipelined wall {dt_wall * 1e3:.3f} ms/batch "
          f"(ratio {dt_wall / dt_chip:.2f})\n"
          f"  achieved {ach_flops / 1e12:.1f} TFLOP/s "
          f"({100 * ach_flops / V5E_PEAK_BF16_FLOPS:.1f}% of v5e bf16 peak"
          f"{'' if roofline_ok else ' — IMPOSSIBLE, number invalid'}), "
          f"gather {ach_gather / 1e9:.1f} GB/s "
          f"({100 * ach_gather / V5E_PEAK_HBM_BYTES:.1f}% of v5e HBM peak)",
          file=sys.stderr)

    print(json.dumps({
        "metric": "serve_throughput_deepfwfm_criteo_full_b8192_onchip",
        "value": round(examples_per_s, 1),
        "unit": "examples/s",
        "vs_baseline": round(examples_per_s / baseline, 2),
        "roofline_ok": roofline_ok,
        "pipelined_wall_examples_per_s": round(b / dt_wall, 1),
    }))


if __name__ == "__main__":
    main()
