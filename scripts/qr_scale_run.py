#!/usr/bin/env python
"""QR embeddings at paper scale (VERDICT r4 #4).

The reference measured QR (quotient-remainder compositional embeddings,
``model/QREmbeddingBag.py:135-174``): ~3× fewer embedding params at
−0.0028 AUC on full Criteo (``data/results/criteo.md:7``). QR is unit-tested
here (values/grads/sharded/super-packed) but has no at-scale record; this
produces the RESULTS.md "QR at scale" row: dense vs ``-qr_emb 1
-qr_collisions 4`` on the 1M-row full-Criteo-dims planted dataset —

* valid-AUC trajectory + best test AUC per arm,
* embedding-table bytes (the 3×-params claim),
* train-step ms at b=2048 (the q-table sits UNDER the gather knee — does the
  big-operand in-scan penalty disappear?),
* batch-8192 serving marginal throughput.

Usage: python scripts/qr_scale_run.py --cache /tmp/synth1m.npz [--collisions 4]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def table_bytes(params) -> int:
    import jax
    tot = 0
    for group in ("emb1", "emb2"):
        if group in params:
            tot += sum(int(np.prod(l.shape)) * l.dtype.itemsize
                       for l in jax.tree.leaves(params[group]))
    return tot


def train_step_ms(mcfg, k=16, b=2048):
    """Median on-chip step time of the K-step scan dispatch (train_bench
    protocol: device_get of summed losses forces completion)."""
    import jax
    import jax.numpy as jnp

    from functools import partial

    from xsdeepfwfm_deprecated_tpu.config import TrainConfig
    from xsdeepfwfm_deprecated_tpu.models import deepfwfm
    from xsdeepfwfm_deprecated_tpu.ops import superpack
    from xsdeepfwfm_deprecated_tpu.train.trainer import (make_multi_step,
                                                         make_optimizer)
    tcfg = TrainConfig(batch_size=b, steps_per_call=k)
    params = jax.device_put(deepfwfm.init_params(jax.random.PRNGKey(0), mcfg))
    spec = deepfwfm.make_embedding_spec(mcfg)
    params = superpack.pack_params(params, spec)
    fwd = partial(deepfwfm.forward, lookup_fn=superpack.super_lookup)
    optimizer = make_optimizer(tcfg)
    opt_state = jax.device_put(optimizer.init(params))
    multi = make_multi_step(mcfg, tcfg, optimizer, forward_fn=fwd)
    rng = np.random.default_rng(0)
    xi = jnp.asarray(rng.integers(0, [s for s in mcfg.feature_sizes[13:]],
                                  size=(k, b, 26)).astype(np.int32))
    xv = jnp.asarray(rng.normal(size=(k, b, 13)).astype(np.float32))
    y = jnp.asarray((rng.random((k, b)) < 0.3).astype(np.float32))
    mask = jnp.ones((k, b), jnp.float32)
    key = jax.random.PRNGKey(1)
    zeros_t = jnp.zeros((k, b), jnp.float32)
    p, o, losses = multi(params, opt_state, xi, xv, y, mask, key, zeros_t)
    jax.device_get(jnp.sum(losses))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        p, o, losses = multi(p, o, xi, xv, y, mask, key, zeros_t)
        jax.device_get(jnp.sum(losses))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] / k * 1e3


def serving_m_ex_s(est, Xi, Xv, b=8192):
    import jax.numpy as jnp

    from xsdeepfwfm_deprecated_tpu.serving.predictor import Predictor
    from xsdeepfwfm_deprecated_tpu.utils.profiling import marginal_timeit
    pred = Predictor(est.params, est.mcfg)
    # modulo windows: 16 FULL distinct b-row batches even when len(Xi) < 16·b
    # (the old [i*b:(i+1)*b] slicing went short/empty past len(Xi)//b and
    # inflated throughput ~1.3× — round-5 marginal_timeit audit)
    n = len(Xi)
    inputs = []
    for i in range(16):
        sl = np.arange(i * b, (i + 1) * b) % n
        inputs.append((jnp.asarray(Xi[sl]), jnp.asarray(Xv[sl])))
    t = marginal_timeit(pred._fn, pred._model, inputs, reps=5)
    return b / t / 1e6, t * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", default="/tmp/synth1m.npz")
    ap.add_argument("--collisions", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke tests; never attaches "
                         "the single-client TPU tunnel)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from xsdeepfwfm_deprecated_tpu.config import ModelConfig, TrainConfig
    from xsdeepfwfm_deprecated_tpu.train.trainer import DeepFMEstimator
    from xsdeepfwfm_deprecated_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    z = np.load(args.cache)
    xi, xv, y = z["xi"], z["xv"], z["y"]
    sizes = tuple(int(s) for s in z["feature_sizes"])
    n = len(y)
    n_test = n // 10
    te, va, tr = slice(0, n_test), slice(n_test, 2 * n_test), slice(2 * n_test, n)

    for qr in (False, True):
        mcfg = ModelConfig(
            field_size=39, feature_sizes=sizes, numerical=13,
            embedding_size=10, h_depth=3, deep_nodes=400,
            use_fwfm=True, use_deep=True, use_lw=True, use_fwlw=True,
            qr_flag=qr, qr_collisions=args.collisions, qr_threshold=200,
            qr_operation="mult")
        tcfg = TrainConfig(n_epochs=args.epochs, batch_size=args.batch,
                           learning_rate=1e-3, weight_decay=3e-7,
                           random_seed=0, steps_per_call=10,
                           eval_train_rows=200000)
        est = DeepFMEstimator(mcfg, tcfg)
        t0 = time.time()
        est.fit(xi[tr], xv[tr], y[tr], xi[va], xv[va], y[va], keep_best=True)
        wall = time.time() - t0
        loss, auc, _, _ = est.eval_by_batch(xi[te], xv[te], y[te])
        out = {"arm": "qr%d" % args.collisions if qr else "dense",
               "valid_auc_by_epoch": [round(v, 4) for v in est.valid_result],
               "test_auc": round(auc, 4), "test_logloss": round(loss, 4),
               "train_wall_s": round(wall, 1),
               "emb_table_mb": round(table_bytes(est.params) / 1e6, 1)}
        if est.best_params is not None:
            import jax
            final = est.params
            est.params = jax.device_put(est.best_params)
            _, ba, _, _ = est.eval_by_batch(xi[te], xv[te], y[te])
            out["best_test_auc"] = round(ba, 4)
            est.params = final
        out["train_step_ms_b2048"] = round(train_step_ms(mcfg), 3)
        mexs, ms = serving_m_ex_s(est, xi[te], xv[te])
        out["serve_b8192_m_ex_s"] = round(mexs, 2)
        out["serve_b8192_ms"] = round(ms, 3)
        print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
