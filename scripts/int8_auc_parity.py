#!/usr/bin/env python
"""Fused-int8 quality closure (VERDICT r2 #7): AUC parity at paper scale.

The reference's finding is IDENTICAL AUC after dynamic int8 quantization
(``/root/reference/data/results/criteo.md:8``). Round 2 proved this for the
layerwise int8 path but gave only a logit correlation for the FUSED Pallas
tower. This script measures test AUC/logloss on the same at-scale synthetic
test slice for three serving paths off one trained checkpoint:

* fp32 (the checkpointed model as-is);
* int8 layerwise (dynamic scales, one ``quantized_dense`` per layer);
* int8 fused (ONE Pallas kernel for the whole tower, activations in VMEM).

Usage:
  python scripts/int8_auc_parity.py --checkpoint saved_models/synth10m_dense \
      --cache /tmp/synth10m.npz [--rows 10000000]
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--cache", required=True, help="synthetic dataset npz")
    ap.add_argument("--batch", type=int, default=8192,
                    help="eval batch (must be %%512==0 for the fused path)")
    ap.add_argument("--test-rows", type=int, default=0,
                    help="test-slice rows (default: rows//10 as in the "
                         "synthetic_scale_run splits)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from xsdeepfwfm_deprecated_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from xsdeepfwfm_deprecated_tpu.compression.quantization import (
        QuantizedModel, convert, quantized_forward)
    from xsdeepfwfm_deprecated_tpu.config import ModelConfig
    from xsdeepfwfm_deprecated_tpu.models import deepfwfm
    from xsdeepfwfm_deprecated_tpu.train import checkpoint as ckpt
    from xsdeepfwfm_deprecated_tpu.train import metrics as M

    z = np.load(args.cache)
    xi, xv, y = z["xi"], z["xv"], z["y"]
    feature_sizes = z["feature_sizes"].tolist()
    n_test = args.test_rows or max(len(y) // 10, 1000)
    n_num = xv.shape[1]
    xi, xv, y = xi[:n_test], xv[:n_test], y[:n_test].astype(np.float64)

    cfg = ModelConfig(field_size=len(feature_sizes),
                      feature_sizes=tuple(feature_sizes), numerical=n_num,
                      embedding_size=10, h_depth=3, deep_nodes=400,
                      use_fwfm=True, use_deep=True, use_lw=True, use_fwlw=True)
    params = deepfwfm.init_params(jax.random.PRNGKey(0), cfg)
    params, _, _ = ckpt.load_checkpoint(args.checkpoint, params)
    qm = convert(params, cfg, mode="dynamic")

    fns = {
        "fp32": jax.jit(lambda m, a, v: deepfwfm.forward(m, a, v, cfg)),
        "int8-layerwise": jax.jit(
            lambda m, a, v: quantized_forward(m, a, v, use_fused_kernel=False)),
        "int8-fused": jax.jit(
            lambda m, a, v: quantized_forward(m, a, v, use_fused_kernel=True)),
    }
    b = args.batch
    assert b % 512 == 0, "fused path needs batch % 512 == 0"
    pad = (-len(y)) % b
    xi_p = np.concatenate([xi, np.repeat(xi[:1], pad, 0)]) if pad else xi
    xv_p = np.concatenate([xv, np.repeat(xv[:1], pad, 0)]) if pad else xv

    results = {}
    for name, fn in fns.items():
        model = params if name == "fp32" else qm
        logits = []
        for lo in range(0, len(xi_p), b):
            out = fn(model, jnp.asarray(xi_p[lo:lo + b]),
                     jnp.asarray(xv_p[lo:lo + b]))
            logits.append(np.asarray(out))
        logits = np.concatenate(logits)[:n_test].astype(np.float64)
        pred = 1.0 / (1.0 + np.exp(-logits))
        results[name] = {
            "auc": round(M.roc_auc(y, pred), 5),
            "logloss": round(M.bce_logits_sum(y, logits) / n_test, 5),
        }
        if name != "fp32":
            results[name]["logit_corr_vs_fp32"] = round(float(np.corrcoef(
                logits, results["fp32"]["_logits"])[0, 1]), 5)
        else:
            results[name]["_logits"] = logits
    results["fp32"].pop("_logits")
    results["fused_vs_fp32_auc_gap"] = round(
        results["fp32"]["auc"] - results["int8-fused"]["auc"], 5)
    results["fused_vs_layerwise_auc_gap"] = round(
        results["int8-layerwise"]["auc"] - results["int8-fused"]["auc"], 5)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
