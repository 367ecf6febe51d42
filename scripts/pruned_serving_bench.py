#!/usr/bin/env python
"""TPU pruned-serving benchmark: dense vs compacted-pruned vs int8 paths.

The TPU mirror of the reference's sparse-serving latency study
(``/root/reference/latency/criteo_latency.cpp:144-170``, paper Table 5:
46×/27× single-example CSR speedups on CPU). On a TPU the MXU is a dense
systolic array, so the win comes from STRUCTURAL compaction
(:mod:`xsdeepfwfm_deprecated_tpu.serving.compaction`), not CSR:

* ``unstructured-compact``: the paper's D-90/R-90/F-40 recipe applied
  element-wise, then compacted — the honest arm: scattered zeros leave no
  dead units, so the tower cannot shrink (expected ≈ dense latency, smaller
  table footprint only via all-zero rows);
* ``structured-compact``: D-90 at UNIT granularity (``-prune_deep_structured``,
  TPU extension) → the 400³ tower compacts to ~126³ dense;
* ``int8`` / ``int8-compact``: weight-only int8 embeddings + int8 MXU tower,
  alone and on top of structured compaction.

Timing is ON-CHIP via ``scan_timeit`` (one dispatch chains the forwards; a
tunnel RTT cannot pollute the number) at batch 8192 and batch 1.

``--checkpoint`` loads real pruned params (e.g. from
``synthetic_scale_run.py --save``) instead of synthesizing the prune pattern
on random init; ``--zero-rows`` additionally forces a given all-zero-row
fraction into emb2 to model the trained F-pruning pattern.
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="", help="pruned checkpoint to load")
    ap.add_argument("--zero-rows", type=float, default=0.0,
                    help="force this all-zero-row fraction into emb2")
    ap.add_argument("--sparse", type=float, default=0.9)
    ap.add_argument("--emb-r", type=float, default=0.444)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--batches", default="8192,1")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny model + CPU backend (CI smoke, no TPU client)")
    args = ap.parse_args()

    import jax
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from xsdeepfwfm_deprecated_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from __graft_entry__ import _flagship
    from xsdeepfwfm_deprecated_tpu.compression.pruning import prune_params
    from xsdeepfwfm_deprecated_tpu.compression.quantization import convert
    from xsdeepfwfm_deprecated_tpu.models import deepfwfm
    from xsdeepfwfm_deprecated_tpu.serving.compaction import (
        compact_for_serving, compaction_report)
    from xsdeepfwfm_deprecated_tpu.serving.predictor import Predictor
    from xsdeepfwfm_deprecated_tpu.train import checkpoint as ckpt
    from xsdeepfwfm_deprecated_tpu.utils.profiling import marginal_timeit, scan_timeit

    cfg = (_flagship(feature_scale=64, deep_nodes=64, embedding_size=8)
           if args.smoke else _flagship(full_criteo=True))
    params = deepfwfm.init_params(jax.random.PRNGKey(0), cfg)
    if args.checkpoint:
        params, _, _ = ckpt.load_checkpoint(args.checkpoint, params)
        print(f"loaded {args.checkpoint}", file=sys.stderr)

    rng = np.random.default_rng(0)

    def prune(p, structured):
        # paper recipe rates: D at `sparse`, R at sparse·1.0, F at sparse·emb_r
        p = prune_params(p, jnp.float32(args.sparse), emb_r=args.emb_r,
                         emb_corr=1.0, prune_fm=not args.checkpoint,
                         prune_deep=True, prune_r=True,
                         structured_deep=structured)
        if args.zero_rows > 0:
            t = np.asarray(p["emb2"]["dense"]).copy()
            kill = rng.random(t.shape[0]) < args.zero_rows
            t[kill] = 0.0
            p = dict(p)
            p["emb2"] = dict(p["emb2"])
            p["emb2"]["dense"] = jnp.asarray(t)
        return p

    p_unstr = prune(params, structured=False)
    p_struct = prune(params, structured=True)

    cm_unstr = compact_for_serving(p_unstr, cfg)
    cm_struct = compact_for_serving(p_struct, cfg)
    cm_tower = compact_for_serving(p_struct, cfg, compact_rows=False)
    cm_struct8 = compact_for_serving(p_struct, cfg, int8=True)
    cm_tower8 = compact_for_serving(p_struct, cfg, int8=True, compact_rows=False)
    qm = convert(params, cfg, mode="dynamic")

    print("compaction (unstructured):",
          json.dumps({k: v for k, v in compaction_report(p_unstr, cm_unstr, cfg).items()
                      if not k.startswith("tower_shapes")}), file=sys.stderr)
    rep_s = compaction_report(p_struct, cm_struct, cfg)
    print("compaction (structured):  ",
          json.dumps({k: v for k, v in rep_s.items()
                      if not k.startswith("tower_shapes")}), file=sys.stderr)
    print("  structured tower:", rep_s["tower_shapes_orig"], "→",
          rep_s["tower_shapes_compact"], file=sys.stderr)

    arms = [
        ("fp32-dense", Predictor(params, cfg)),
        ("unstructured-compact", Predictor(cm_unstr)),
        ("structured-compact", Predictor(cm_struct)),
        ("structured-tower-only", Predictor(cm_tower)),
        ("int8", Predictor(qm)),
        ("int8-structured-compact", Predictor(cm_struct8)),
        ("int8-structured-tower-only", Predictor(cm_tower8)),
    ]

    rows = []
    K2 = 4 if args.smoke else 16
    for bstr in args.batches.split(","):
        b = int(bstr)
        b = min(b, 256) if args.smoke else b
        inputs = []
        for _ in range(K2):
            xi = rng.integers(0, [s for s in cfg.feature_sizes[13:]],
                              size=(b, 26)).astype(np.int32)
            xv = rng.normal(size=(b, 13)).astype(np.float32)
            inputs.append((jax.device_put(xi), jax.device_put(xv)))
        for name, pred in arms:
            if b == 1:
                # single-request LATENCY is inherently serialized: the
                # scan-chained protocol is the right semantics (and the
                # marginal slope of a ~30 µs op drowns in RTT jitter)
                t = scan_timeit(pred._fn, pred._model, *inputs[0],
                                iters=200, reps=3)
            else:
                t = marginal_timeit(pred._fn, pred._model, inputs, k2=K2,
                                    reps=3 if args.smoke else 7)
            rows.append({"arm": name, "batch": b, "us_per_batch": t * 1e6,
                         "examples_per_s": b / t})
            print(f"  b={b:5d} {name:24s} {t * 1e6:10.1f} µs/batch "
                  f"{b / t:14,.0f} ex/s", file=sys.stderr)

    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
