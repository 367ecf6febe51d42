"""Training-throughput benchmark: examples/s for the jitted DeepFwFM train step.

Companion to ``bench.py`` (the driver's serving headline): measures the FULL
training step (forward + backward + Adam + L2) on the flagship Criteo-shaped
DeepFwFM at batch 2048 (the reference's training batch,
``utils/parameters.py:30``).

Baseline context: the reference trains single-device with per-batch H2D copies
(``model/DeepFMs.py:619-623``); no reference train-throughput number is
published, so this reports absolute examples/s/chip.

Usage::  python benchmarks/train_bench.py [--batch 2048]
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _flagship
    from xsdeepfwfm_deprecated_tpu.config import TrainConfig
    from xsdeepfwfm_deprecated_tpu.models import deepfwfm
    from xsdeepfwfm_deprecated_tpu.train.trainer import make_optimizer, make_train_step
    from xsdeepfwfm_deprecated_tpu.utils.profiling import simple_timeit

    cfg = _flagship()
    tcfg = TrainConfig(batch_size=args.batch)
    params = jax.jit(lambda k: deepfwfm.init_params(k, cfg))(jax.random.PRNGKey(0))
    optimizer = make_optimizer(tcfg)
    opt_state = optimizer.init(params)
    train_step = make_train_step(cfg, tcfg, optimizer)

    b = args.batch
    rng = np.random.default_rng(0)
    xi = jnp.asarray(rng.integers(0, [s for s in cfg.feature_sizes[13:]],
                                  size=(b, 26)).astype(np.int32))
    xv = jnp.asarray(rng.normal(size=(b, 13)).astype(np.float32))
    y = jnp.asarray((rng.random(b) < 0.3).astype(np.float32))
    mask = jnp.ones((b,), jnp.float32)
    key = jax.random.PRNGKey(1)
    zeros_t = jnp.zeros((b,), jnp.float32)

    state = {"p": params, "o": opt_state}

    def one_step():
        state["p"], state["o"], loss = train_step(
            state["p"], state["o"], xi, xv, y, mask, key, zeros_t)
        return loss

    t = simple_timeit(one_step, tries=30, warmup=2)
    print(json.dumps({
        "metric": "train_throughput_deepfwfm_b%d" % b,
        "value": round(b / t, 1),
        "unit": "examples/s",
        "step_ms": round(t * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
