"""Training-throughput benchmark: examples/s for the jitted DeepFwFM train step.

Companion to ``bench.py`` (the driver's serving headline): measures the FULL
training step (forward + backward + Adam + L2) on the flagship Criteo-shaped
DeepFwFM at batch 2048 (the reference's training batch,
``utils/parameters.py:30``), as a K-step ``make_multi_step`` scan dispatch —
the exact shape the trainer's fit loop launches — with completion forced by
``jax.device_get`` of the summed per-step losses (round-3 protocol; the old
per-call ``simple_timeit`` wall included one tunnel RTT per step).

Baseline context: the reference trains single-device with per-batch H2D copies
(``model/DeepFMs.py:619-623``); no reference train-throughput number is
published, so this reports absolute examples/s/chip.

Usage::  python benchmarks/train_bench.py [--batch 2048] [--k 16]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--k", type=int, default=16, help="steps per dispatch")
    ap.add_argument("--full-criteo", action="store_true",
                    help="paper-scale 1.33M-feature tables")
    ap.add_argument("--layout", choices=["super", "flat"], default="super",
                    help="embedding-table layout (super = round-4 packed "
                         "128-lane lines, the trainer default; flat = the "
                         "logical (N, E) layout for A/B timing)")
    ap.add_argument("--table-dtype", choices=["f32", "bf16"], default="f32",
                    help="table+moment storage dtype (-table_dtype flag)")
    args = ap.parse_args()

    import time

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from xsdeepfwfm_deprecated_tpu.config import TrainConfig
    from xsdeepfwfm_deprecated_tpu.models import deepfwfm
    from xsdeepfwfm_deprecated_tpu.train.trainer import make_multi_step, make_optimizer

    cfg = _flagship(full_criteo=args.full_criteo)
    if args.table_dtype != "f32":
        import dataclasses
        cfg = dataclasses.replace(cfg, table_dtype=args.table_dtype)
    tcfg = TrainConfig(batch_size=args.batch, steps_per_call=args.k,
                       table_layout=args.layout)
    params = jax.device_put(deepfwfm.init_params(jax.random.PRNGKey(0), cfg))
    forward_fn = None
    if args.layout == "super":
        from functools import partial

        from xsdeepfwfm_deprecated_tpu.ops import superpack
        spec = deepfwfm.make_embedding_spec(cfg)
        params = superpack.pack_params(params, spec)
        forward_fn = partial(deepfwfm.forward,
                             lookup_fn=superpack.super_lookup)
    optimizer = make_optimizer(tcfg)
    opt_state = jax.device_put(optimizer.init(params))
    multi = make_multi_step(cfg, tcfg, optimizer, forward_fn=forward_fn)

    b, K = args.batch, args.k
    rng = np.random.default_rng(0)
    xi = jnp.asarray(rng.integers(0, [s for s in cfg.feature_sizes[13:]],
                                  size=(K, b, 26)).astype(np.int32))
    xv = jnp.asarray(rng.normal(size=(K, b, 13)).astype(np.float32))
    y = jnp.asarray((rng.random((K, b)) < 0.3).astype(np.float32))
    mask = jnp.ones((K, b), jnp.float32)
    key = jax.random.PRNGKey(1)
    zeros_t = jnp.zeros((K, b), jnp.float32)

    p, o = params, opt_state
    p, o, losses = multi(p, o, xi, xv, y, mask, key, zeros_t)
    jax.device_get(jnp.sum(losses))              # warm-up + force completion
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        p, o, losses = multi(p, o, xi, xv, y, mask, key, zeros_t)
        jax.device_get(jnp.sum(losses))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    t = ts[len(ts) // 2] / K
    print(json.dumps({
        "metric": "train_throughput_deepfwfm_b%d_k%d" % (b, K),
        "value": round(b / t, 1),
        "unit": "examples/s",
        "step_ms": round(t * 1e3, 3),
        "layout": args.layout,
        "table_dtype": args.table_dtype,
    }))


if __name__ == "__main__":
    main()
