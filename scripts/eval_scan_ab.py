#!/usr/bin/env python
"""A/B the eval dispatch shape: scanned (K=8 batches per dispatch) vs
straight-line batched eval (VERDICT r4 weak #2).

The eval path adopted ``lax.scan`` groups (``trainer.EVAL_SCAN_K = 8``) for
RTT amortization, but in-scan TPU gathers run 3-4× slower than straight-line
(RESULTS.md "Measurement methodology") — and ``_predict_logits`` dispatches
every group ASYNC and fetches once at the end, so per-dispatch RTT largely
overlaps anyway. This measures the PRODUCT path end to end: full-Criteo-scale
paper model, N rows through ``DeepFMEstimator._predict_logits`` with (A) the
scan default and (B) ``EVAL_SCAN_K`` forced past N so every batch goes
straight-line. Wall includes the host feed + final D2H fetch (np.asarray of
every logit block — completion is forced by construction; block_until_ready
is not trusted on this platform).

The winner becomes the trainer default; reference counterpart of the path:
``model/DeepFMs.py:750-784`` (one forward per 8192-row batch).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from synthetic_scale_run import FULL_CRITEO_CAT_SIZES  # noqa: E402

N_ROWS = 1_048_576
REPS = 3


def main():
    from xsdeepfwfm_deprecated_tpu.config import ModelConfig, TrainConfig
    from xsdeepfwfm_deprecated_tpu.train import trainer as T
    from xsdeepfwfm_deprecated_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    sizes = [1] * 13 + FULL_CRITEO_CAT_SIZES
    mcfg = ModelConfig(field_size=39, feature_sizes=tuple(sizes), numerical=13,
                       embedding_size=10, h_depth=3, deep_nodes=400,
                       use_fwfm=True, use_deep=True, use_lw=True, use_fwlw=True)
    tcfg = TrainConfig(batch_size=2048)
    est = T.DeepFMEstimator(mcfg, tcfg)
    est.init_params()

    rng = np.random.default_rng(0)
    cs = np.asarray(FULL_CRITEO_CAT_SIZES)
    Xi = (rng.random((N_ROWS, 26)) * cs).astype(np.int32)
    Xv = rng.normal(size=(N_ROWS, 13)).astype(np.float32)

    out = {"rows": N_ROWS, "eval_batch": est.tcfg.eval_batch_size,
           "scan_k": T.EVAL_SCAN_K}
    default_k = T.EVAL_SCAN_K
    for name, k in (("scan_k8", default_k), ("straight", 10 ** 9)):
        T.EVAL_SCAN_K = k
        est._eval_fn = est._scan_eval_fn = None      # force fresh jit per arm
        est._predict_logits(Xi[:65536], Xv[:65536])  # compile warmup
        walls = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            logits = est._predict_logits(Xi, Xv)
            assert logits.shape == (N_ROWS,) and np.isfinite(logits[:8]).all()
            walls.append(time.perf_counter() - t0)
        best = min(walls)
        out[name] = {"wall_s": round(best, 3),
                     "m_rows_per_s": round(N_ROWS / best / 1e6, 3),
                     "all_walls": [round(w, 3) for w in walls]}
        print(json.dumps({name: out[name]}), flush=True)
    T.EVAL_SCAN_K = default_k
    a, b = out["scan_k8"]["wall_s"], out["straight"]["wall_s"]
    out["straight_over_scan"] = round(a / b, 3)
    out["winner"] = "straight" if b < a else "scan_k8"
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
