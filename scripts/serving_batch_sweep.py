#!/usr/bin/env python
"""Batch-size sweep of the serving forward on the GROUPED product layout
(round 5; the flat-layout sweep is in RESULTS.md "Serving throughput" —
flat peaked at b=16384 / 6.65M ex/s).

The headline protocol stays at the reference's batch 8192
(``/root/reference/data/results/criteo.md:5``); this records where the
grouped layout peaks. Marginal protocol, D2H-forced.

Usage: python scripts/serving_batch_sweep.py [--batches 4096,8192,16384,32768]
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="4096,8192,16384,32768,65536")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from __graft_entry__ import _flagship
    from xsdeepfwfm_deprecated_tpu.models import deepfwfm
    from xsdeepfwfm_deprecated_tpu.serving.predictor import Predictor
    from xsdeepfwfm_deprecated_tpu.utils import enable_compilation_cache
    from xsdeepfwfm_deprecated_tpu.utils.profiling import marginal_timeit
    enable_compilation_cache()

    cfg = _flagship(full_criteo=True)
    params = deepfwfm.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    out = {}
    for b in (int(s) for s in args.batches.split(",")):
        pred = Predictor(params, cfg)   # auto → grouped
        inputs = []
        for _ in range(16):   # marginal_timeit needs k2=16 DISTINCT inputs
            xi = rng.integers(0, [s for s in cfg.feature_sizes[13:]],
                              size=(b, 26)).astype(np.int32)
            xv = rng.normal(size=(b, 13)).astype(np.float32)
            inputs.append((jax.device_put(xi), jax.device_put(xv)))
        dt = marginal_timeit(pred._fn, pred._model, inputs, reps=5)
        out[f"b{b}"] = {"ms": round(dt * 1e3, 3),
                        "m_ex_s": round(b / dt / 1e6, 2)}
        print(f"b={b}: {dt*1e3:.3f} ms, {b/dt/1e6:.2f}M ex/s", flush=True)
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
