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

Protocol (round 4 revision — see RESULTS.md "Measurement methodology"):

* round 2 pipelined dispatch loops measured the HOST'S ENQUEUE rate through
  the remote-attachment tunnel (``block_until_ready`` on this platform can
  return before on-chip work completes — a 100-step scan "finished" in
  0.26 ms while fetching its scalar result took 961 ms), reporting 237.9M
  ex/s = 119% of the v5e bf16 peak;
* a scan-serialized chain (one dispatch running N forwards back-to-back)
  forces completion correctly but the scan environment runs TPU gathers
  ~3-4× slower than straight-line code (measured: the same 320K-row lookup
  is 1.3 ms outside a scan body and 4-10 ms inside one), so it OVERSTATES
  serving cost;
* the HEADLINE is the MARGINAL cost of one forward in a straight-line
  dispatch: time(K2 independent forwards in one jit) − time(K1) divided by
  K2−K1, completion forced by ``jax.device_get`` of the summed logits.
  Distinct input batches defeat CSE; the summed output defeats DCE; the
  subtraction cancels the dispatch RTT. CAVEAT (advisor, round 3): with 16
  independent replicas in one XLA program the scheduler may overlap one
  replica's gathers with another's MXU work, so this is MULTI-BATCH-PER-
  DISPATCH streaming throughput — a server that fuses ~16 batches per
  dispatch (or runs one 131072-row batch; see next bullet) achieves it; a
  strictly one-batch-per-dispatch server gets the sequential number, which
  is reported alongside in the JSON (``scan_serialized_examples_per_s`` /
  ``pipelined_wall_examples_per_s``);
* third protocol, free of both confounds (no scan, no independent-replica
  overlap): ONE concatenated batch-131072 forward (16×8192 rows in a single
  gather + a single MLP), marginal-timed; reported as
  ``bigbatch_examples_per_s``.

A roofline guard marks the JSON invalid if achieved FLOP/s exceeds the
chip's bf16 peak, or if the marginal slope is non-positive / exceeds the
scan-serialized upper bound (dispatch-jitter sanity, advisor round 3).
"""

import json
import sys
import time

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
    """HBM gather traffic per example, PADDED layout: the (N, 10) f32 table
    is lane-padded to 128 on TPU, so each gathered categorical row moves a
    512-byte line; numeric rows are static slices (no gather)."""
    C = cfg.field_size - cfg.numerical
    return C * 128 * 4.0


def main():
    import jax
    import jax.numpy as jnp

    from xsdeepfwfm_deprecated_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from __graft_entry__ import _flagship
    from xsdeepfwfm_deprecated_tpu.models import deepfwfm
    from xsdeepfwfm_deprecated_tpu.ops import superpack
    from xsdeepfwfm_deprecated_tpu.ops.embedding import packed_lookup_serving
    from xsdeepfwfm_deprecated_tpu.utils.profiling import marginal_timeit, scan_timeit

    cfg = _flagship(full_criteo=True)
    # serving headline = the Predictor's product layout: field-GROUPED
    # gathers (round 5 — the gather knee is ~1 MB/lane-column regardless of
    # dtype, so the packed table pre-splits into sub-knee field groups with
    # no routing; same logits as the flat single gather, measured 1.37×
    # lookup). Flat single-gather and the super-row layout are reported as
    # A/B companions (super wins TRAINING 2.75× but loses out-of-scan
    # serving — round 4).
    params = jax.device_put(deepfwfm.init_params(jax.random.PRNGKey(0), cfg))
    spec = deepfwfm.make_embedding_spec(cfg)
    params_super = jax.device_put(superpack.pack_params(params, spec))
    from xsdeepfwfm_deprecated_tpu.ops.embedding import (
        grouped_lookup_serving, split_serving_tables)
    params_grouped = dict(params)
    for key in ("emb1", "emb2"):
        if key in params_grouped and "dense" in params_grouped[key]:
            params_grouped[key] = split_serving_tables(params_grouped[key], spec)
    params_grouped = jax.device_put(params_grouped)
    rng = np.random.default_rng(0)
    b = 8192
    K2 = 16
    inputs = []
    for _ in range(K2):
        xi = np.ascontiguousarray(rng.integers(
            0, [s for s in cfg.feature_sizes[13:]], size=(b, 26)).astype(np.int32))
        xv = rng.normal(size=(b, 13)).astype(np.float32)
        inputs.append((jax.device_put(xi), jax.device_put(xv)))

    def fwd(p, xi, xv):
        return deepfwfm.forward(p, xi, xv, cfg,
                                lookup_fn=packed_lookup_serving)

    def fwd_super(p, xi, xv):
        return deepfwfm.forward(p, xi, xv, cfg,
                                lookup_fn=superpack.super_lookup)

    def fwd_grouped(p, xi, xv):
        return deepfwfm.forward(p, xi, xv, cfg,
                                lookup_fn=grouped_lookup_serving)

    # --- headline: marginal on-chip time per batch-8192 forward ------------
    # (shared protocol implementation — utils/profiling.marginal_timeit; a
    # local near-copy drifted from it in round 3, advisor finding)
    dt_flat = marginal_timeit(fwd, params, inputs)
    dt_grouped = marginal_timeit(fwd_grouped, params_grouped, inputs)
    dt_super = marginal_timeit(fwd_super, params_super, inputs)  # layout A/B
    # same logits either way — the headline is the faster measured layout
    dt_chip = min(dt_flat, dt_grouped)

    # --- int8 companion: grouped int8 tables + fused Pallas tower ----------
    # (quality parity with fp32 proven at paper scale: AUC gap 0.00000,
    # RESULTS.md "Fused-int8 AUC parity"; tables 2.9× smaller in HBM)
    from xsdeepfwfm_deprecated_tpu.compression.quantization import (
        convert, group_quantized_tables, quantized_forward)
    qm = jax.device_put(group_quantized_tables(
        convert(jax.device_get(params), cfg, mode="dynamic")))
    fwd_int8 = lambda m, xi, xv: quantized_forward(m, xi, xv,  # noqa: E731
                                                   use_fused_kernel=True)
    dt_int8g = marginal_timeit(fwd_int8, qm, inputs)

    # --- cross-checks ------------------------------------------------------
    jfwd = jax.jit(fwd)
    dt_scan = scan_timeit(jfwd, params, *inputs[0], iters=50, reps=3)
    wall = []
    jsum = jax.jit(lambda o: jnp.sum(o))
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(50):
            out = jfwd(params, *inputs[0])
        # completion forced by D2H of a scalar derived from the LAST output —
        # block_until_ready returns early on this platform (advisor r3 low #2)
        jax.device_get(jsum(out))
        wall.append((time.perf_counter() - t0) / 50)
    dt_wall = sorted(wall)[len(wall) // 2]

    # --- third protocol: ONE concatenated batch-131072 forward -------------
    # no scan, no independent-replica overlap: a single gather + single MLP
    big_rows = 16 * b
    bxi = jax.device_put(np.ascontiguousarray(rng.integers(
        0, [s for s in cfg.feature_sizes[13:]],
        size=(big_rows, 26)).astype(np.int32)))
    bxv = jax.device_put(rng.normal(size=(big_rows, 13)).astype(np.float32))
    jbig = jax.jit(lambda p, xi, xv: jnp.sum(fwd(p, xi, xv)))
    jnull = jax.jit(lambda x: x + 1.0)   # dispatch-RTT estimator
    zero = jax.device_put(np.float32(0.0))
    jax.device_get(jbig(params, bxi, bxv)); jax.device_get(jnull(zero))
    tb, tn = [], []
    for _ in range(7):
        t0 = time.perf_counter()
        jax.device_get(jbig(params, bxi, bxv))
        tb.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.device_get(jnull(zero))
        tn.append(time.perf_counter() - t0)
    dt_big = max(min(tb) - min(tn), 1e-9)   # one forward, RTT subtracted

    examples_per_s = b / dt_chip
    baseline = 8192 / 1.299191  # reference 8192-batch 1-thread CPU ms → ex/s

    # roofline + sanity guard
    fpe = flops_per_example(cfg)
    bpe = gather_bytes_per_example(cfg)
    ach_flops = examples_per_s * fpe
    ach_gather = examples_per_s * bpe
    roofline_ok = (0.0 < dt_chip <= dt_scan       # slope sanity (advisor r3)
                   and ach_flops <= V5E_PEAK_BF16_FLOPS
                   and ach_gather <= V5E_PEAK_HBM_BYTES)
    emb_mb = sum(cfg.feature_sizes) * cfg.embedding_size * 4 / 1e6
    print(f"roofline: model=criteo-full ({sum(cfg.feature_sizes):,} features, "
          f"emb2 {emb_mb:.0f} MB logical > VMEM)\n"
          f"  {fpe / 1e6:.3f} MFLOP/ex, {bpe:.0f} B/ex padded gather\n"
          f"  marginal {dt_chip * 1e3:.3f} ms/batch (headline: multi-batch-"
          f"per-dispatch streaming) | scan-serialized {dt_scan * 1e3:.3f} "
          f"ms/batch (overstates: scan-env gather penalty) | pipelined wall "
          f"{dt_wall * 1e3:.3f} ms/batch (D2H-forced, sequential dispatch) | "
          f"bigbatch-{big_rows} {dt_big * 1e3:.3f} ms "
          f"({dt_big / 16 * 1e3:.3f} ms/8192, single-forward, RTT-subtracted)\n"
          f"  achieved {ach_flops / 1e12:.2f} TFLOP/s "
          f"({100 * ach_flops / V5E_PEAK_BF16_FLOPS:.1f}% of v5e bf16 peak), "
          f"gather {ach_gather / 1e9:.1f} GB/s "
          f"({100 * ach_gather / V5E_PEAK_HBM_BYTES:.1f}% of v5e HBM peak)"
          f"{'' if roofline_ok else ' — EXCEEDS PEAK, number invalid'}",
          file=sys.stderr)

    print(json.dumps({
        "metric": "serve_throughput_deepfwfm_criteo_full_b8192_onchip",
        "value": round(examples_per_s, 1),
        "unit": "examples/s",
        "vs_baseline": round(examples_per_s / baseline, 2),
        "roofline_ok": roofline_ok,
        "headline_layout": "grouped" if dt_grouped <= dt_flat else "flat",
        "flat_examples_per_s": round(b / dt_flat, 1),
        "grouped_examples_per_s": round(b / dt_grouped, 1),
        "int8_grouped_examples_per_s": round(b / dt_int8g, 1),
        "scan_serialized_examples_per_s": round(b / dt_scan, 1),
        "pipelined_wall_examples_per_s": round(b / dt_wall, 1),
        "bigbatch_examples_per_s": round(big_rows / dt_big, 1),
        "super_layout_examples_per_s": round(b / dt_super, 1),
    }))


if __name__ == "__main__":
    main()
