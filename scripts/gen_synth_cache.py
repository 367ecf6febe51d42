#!/usr/bin/env python
"""Generate the synthetic planted-model dataset cache on CPU only.

Split out of synthetic_scale_run so caches can be (re)built while the TPU is
busy with another job — forces the CPU backend before any package import so
this process never attaches the (single-client) TPU tunnel.

Usage: python scripts/gen_synth_cache.py --rows 41300000 --cache /tmp/synth41m.npz
"""

import argparse
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")   # noqa: E402 — before pkg imports

import numpy as np  # noqa: E402

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from synthetic_scale_run import make_synthetic, oracle_auc  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, required=True)
    ap.add_argument("--cache", required=True)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--shape", default="criteo")
    ap.add_argument("--full-criteo-dims", action="store_true")
    args = ap.parse_args()
    t0 = time.time()
    xi, xv, y, feature_sizes, logit, kept = make_synthetic(
        args.rows, args.seed, args.full_criteo_dims, shape=args.shape)
    n_test = max(args.rows // 10, 1000)
    print(f"generated {args.rows:,} rows in {time.time()-t0:.0f}s; "
          f"oracle test AUC {oracle_auc(logit[:n_test], y[:n_test]):.4f}",
          flush=True)
    np.savez(args.cache, xi=xi, xv=xv, y=y, logit=logit,
             feature_sizes=np.asarray(feature_sizes), kept=kept)
    print(f"saved {args.cache} in {time.time()-t0:.0f}s total", flush=True)


if __name__ == "__main__":
    main()
