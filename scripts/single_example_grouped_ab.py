#!/usr/bin/env python
"""Single-example (b=1) latency A/B of the grouped vs flat serving layout at
paper scale — the grouped product default issues G sub-knee gathers per
example instead of 1, so b=1 (where per-op overhead dominates) is the shape
most likely to regress. scan-chained protocol (single-request latency is
inherently serialized; `scripts/pruned_serving_bench.py` b=1 rationale).

Usage: python scripts/single_example_grouped_ab.py
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    if "--cpu" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from __graft_entry__ import _flagship
    from xsdeepfwfm_deprecated_tpu.models import deepfwfm
    from xsdeepfwfm_deprecated_tpu.serving.predictor import Predictor
    from xsdeepfwfm_deprecated_tpu.utils import enable_compilation_cache
    from xsdeepfwfm_deprecated_tpu.utils.profiling import scan_timeit
    enable_compilation_cache()

    cfg = _flagship(full_criteo=True)
    params = deepfwfm.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    out = {}
    for b in (1, 64):
        xi = rng.integers(0, [s for s in cfg.feature_sizes[13:]],
                          size=(b, 26)).astype(np.int32)
        xv = rng.normal(size=(b, 13)).astype(np.float32)
        xi_d, xv_d = jax.device_put(xi), jax.device_put(xv)
        for layout in ("flat", "grouped"):
            pred = Predictor(params, cfg, layout=layout)
            t = scan_timeit(pred._fn, pred._model, xi_d, xv_d,
                            iters=200, reps=3)
            out[f"b{b}_{layout}_us"] = round(t * 1e6, 1)
            print(f"b={b} {layout}: {t*1e6:.1f} us", flush=True)
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
