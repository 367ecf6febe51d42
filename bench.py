"""Benchmark harness — prints ONE JSON line for the driver.

Metric: batched serving throughput (examples/s) of the flagship dense
DeepFwFM forward (Criteo shape: 39 fields, embedding 10, 400^3 deep tower,
lw+fwlw), batch 8192, on the available accelerator.

Baseline: the reference's own measured 8192-batch CPU forward for the same
architecture — 1299.191 ms/batch single-thread (``data/results/criteo.md:5``,
BASELINE.md) → 6305 examples/s. ``vs_baseline`` = ours / reference.
"""

import json
import time

import numpy as np


def main():
    import jax

    from xsdeepfwfm_deprecated_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from __graft_entry__ import _flagship
    from xsdeepfwfm_deprecated_tpu.models import deepfwfm

    cfg = _flagship()
    params = deepfwfm.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    b = 8192
    xi = np.ascontiguousarray(
        rng.integers(0, [s for s in cfg.feature_sizes[13:]], size=(b, 26)).astype(np.int32))
    xv = rng.normal(size=(b, 13)).astype(np.float32)

    fwd = jax.jit(lambda p, a, v: deepfwfm.forward(p, a, v, cfg))
    xi_d, xv_d = jax.device_put(xi), jax.device_put(xv)
    params = jax.device_put(params)

    # warm-up / compile
    jax.block_until_ready(fwd(params, xi_d, xv_d))

    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, xi_d, xv_d)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    examples_per_s = b / dt
    baseline = 8192 / 1.299191  # reference 8192-batch 1-thread CPU ms → ex/s
    print(json.dumps({
        "metric": "serve_throughput_deepfwfm_b8192",
        "value": round(examples_per_s, 1),
        "unit": "examples/s",
        "vs_baseline": round(examples_per_s / baseline, 2),
    }))


if __name__ == "__main__":
    main()
