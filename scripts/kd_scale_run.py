#!/usr/bin/env python
"""Knowledge distillation at paper scale (VERDICT r4 #3).

The reference's KD finding (``kd.py:36-74``, ``data/results/criteo.md:15``):
a 400×2 student distilled from the converged DeepFwFM teacher lands within
noise of the teacher (0.7877 vs 0.7872) at lower latency. The framework's KD
path was previously validated only against a degenerate tiny teacher; this
reproduces the finding's SHAPE on the 1M-row full-Criteo-dims planted
dataset:

1. teacher = paper DeepFwFM (E=10, 400³, lw+fwlw), trained ``--teacher-epochs``
   epochs (AUC ≈ 0.83 at this scale);
2. student A = 400×2 tower (reference ``kd.py:40-43``) trained ALONE;
3. student B = same architecture + init trained WITH the DeepLight KD loss
   (α=0.9, T=20, teacher logits cached per epoch — ``model/DeepFMs.py:
   1030-1064`` semantics);
4. serving latency of teacher vs student at batch 8192 (marginal protocol).

Done-criterion: student+KD ≥ student-alone AND within ~0.005 of the teacher.

Usage: python scripts/kd_scale_run.py --cache /tmp/synth1m.npz
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def serving_ms(est, Xi, Xv, b=8192):
    import jax.numpy as jnp

    from xsdeepfwfm_deprecated_tpu.serving.predictor import Predictor
    from xsdeepfwfm_deprecated_tpu.utils.profiling import marginal_timeit
    pred = Predictor(est.params, est.mcfg)
    # modulo windows — 16 FULL distinct batches (see qr_scale_run, r5 audit)
    import numpy as _np
    n = len(Xi)
    inputs = []
    for i in range(16):
        sl = _np.arange(i * b, (i + 1) * b) % n
        inputs.append((jnp.asarray(Xi[sl]), jnp.asarray(Xv[sl])))
    return marginal_timeit(pred._fn, pred._model, inputs, reps=5) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", default="/tmp/synth1m.npz")
    ap.add_argument("--teacher-epochs", type=int, default=2)
    ap.add_argument("--student-epochs", type=int, default=3)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke tests; never attaches "
                         "the single-client TPU tunnel)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    from xsdeepfwfm_deprecated_tpu.config import ModelConfig, TrainConfig
    from xsdeepfwfm_deprecated_tpu.models import deepfwfm
    from xsdeepfwfm_deprecated_tpu.train.trainer import DeepFMEstimator
    from xsdeepfwfm_deprecated_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    z = np.load(args.cache)
    xi, xv, y = z["xi"], z["xv"], z["y"]
    sizes = tuple(int(s) for s in z["feature_sizes"])
    n = len(y)
    n_test = n // 10
    te, va, tr = slice(0, n_test), slice(n_test, 2 * n_test), slice(2 * n_test, n)

    mcfg_t = ModelConfig(field_size=39, feature_sizes=sizes, numerical=13,
                         embedding_size=10, h_depth=3, deep_nodes=400,
                         use_fwfm=True, use_deep=True, use_lw=True,
                         use_fwlw=True)
    mcfg_s = dataclasses.replace(mcfg_t, deep_nodes=400, h_depth=2)

    def tcfg(epochs, seed=0):
        return TrainConfig(n_epochs=epochs, batch_size=args.batch,
                           learning_rate=1e-3, weight_decay=3e-7,
                           random_seed=seed, steps_per_call=10,
                           eval_train_rows=200000)

    def params_m(est):
        counts = deepfwfm.param_group_counts(est.params, est.mcfg)
        return counts["total"] / 1e6

    out = {}
    teacher = DeepFMEstimator(mcfg_t, tcfg(args.teacher_epochs))
    t0 = time.time()
    teacher.fit(xi[tr], xv[tr], y[tr], xi[va], xv[va], y[va], keep_best=True)
    _, t_auc, _, _ = teacher.eval_by_batch(xi[te], xv[te], y[te])
    out["teacher"] = {"test_auc": round(t_auc, 4),
                      "valid": [round(v, 4) for v in teacher.valid_result],
                      "params_m": round(params_m(teacher), 2),
                      "wall_s": round(time.time() - t0, 1)}
    print(json.dumps({"teacher": out["teacher"]}), flush=True)

    for name, kd in (("student_alone", False), ("student_kd", True)):
        est = DeepFMEstimator(mcfg_s, tcfg(args.student_epochs))
        t0 = time.time()
        est.fit(xi[tr], xv[tr], y[tr], xi[va], xv[va], y[va], keep_best=True,
                teacher_model=teacher if kd else None)
        _, auc, _, _ = est.eval_by_batch(xi[te], xv[te], y[te])
        res = {"test_auc": round(auc, 4),
               "valid": [round(v, 4) for v in est.valid_result],
               "params_m": round(params_m(est), 2),
               "wall_s": round(time.time() - t0, 1)}
        if est.best_params is not None:
            import jax
            final = est.params
            est.params = jax.device_put(est.best_params)
            _, ba, _, _ = est.eval_by_batch(xi[te], xv[te], y[te])
            res["best_test_auc"] = round(ba, 4)
            est.params = final
        out[name] = res
        print(json.dumps({name: res}), flush=True)
        if kd:
            out["student_serve_b8192_ms"] = round(
                serving_ms(est, xi[te], xv[te]), 3)
    out["teacher_serve_b8192_ms"] = round(serving_ms(teacher, xi[te], xv[te]), 3)

    ka = out["student_kd"].get("best_test_auc", out["student_kd"]["test_auc"])
    aa = out["student_alone"].get("best_test_auc", out["student_alone"]["test_auc"])
    ta = out["teacher"]["test_auc"]
    out["kd_minus_alone"] = round(ka - aa, 4)
    out["kd_minus_teacher"] = round(ka - ta, 4)
    out["ok"] = bool(ka >= aa - 1e-4 and ka >= ta - 0.005)
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
