#!/usr/bin/env python
"""Attempt to capture a real TPU profiler trace for the batch-8192 serving
forward (VERDICT r3 #9; reference exports a chrome trace from its benchmark,
``/root/reference/model/DeepFMs.py:975-978``).

On success: writes an xprof/perfetto trace under --out and prints the
artifact paths. On failure: prints the EXACT failing call + exception, which
RESULTS.md records as the documented platform limitation.

Usage: python scripts/capture_trace.py [--out traces/r4_serving]
"""

import argparse
import glob
import os
import sys
import traceback

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="traces/r4_serving")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from xsdeepfwfm_deprecated_tpu.models import deepfwfm
    from xsdeepfwfm_deprecated_tpu.ops import superpack
    from xsdeepfwfm_deprecated_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    cfg = _flagship(full_criteo=True)
    spec = deepfwfm.make_embedding_spec(cfg)
    params = jax.device_put(superpack.pack_params(
        deepfwfm.init_params(jax.random.PRNGKey(0), cfg), spec))
    rng = np.random.default_rng(0)
    xi = jax.device_put(rng.integers(
        0, [s for s in cfg.feature_sizes[13:]], size=(8192, 26)).astype(np.int32))
    xv = jax.device_put(rng.normal(size=(8192, 13)).astype(np.float32))
    fwd = jax.jit(lambda p, a, v: deepfwfm.forward(
        p, a, v, cfg, lookup_fn=superpack.super_lookup))
    jax.device_get(jnp.sum(fwd(params, xi, xv)))   # warm (compile outside trace)

    os.makedirs(args.out, exist_ok=True)
    print(f"platform={jax.devices()[0].platform} device={jax.devices()[0]}")
    try:
        jax.profiler.start_trace(args.out)
    except Exception:
        print("FAILED at jax.profiler.start_trace:")
        traceback.print_exc()
        return 1
    try:
        for _ in range(5):
            out = fwd(params, xi, xv)
        jax.device_get(jnp.sum(out))
    finally:
        try:
            jax.profiler.stop_trace()
        except Exception:
            print("FAILED at jax.profiler.stop_trace:")
            traceback.print_exc()
            return 1
    artifacts = glob.glob(os.path.join(args.out, "**", "*"), recursive=True)
    files = [a for a in artifacts if os.path.isfile(a)]
    total = sum(os.path.getsize(f) for f in files)
    print(f"trace artifacts ({len(files)} files, {total/1e6:.2f} MB):")
    for f in sorted(files)[:20]:
        print("  ", f, os.path.getsize(f))
    # a device trace must contain more than the host-side python events;
    # look for the xplane proto that holds device lanes
    xplanes = [f for f in files if f.endswith(".xplane.pb")]
    print("xplane.pb present:" , bool(xplanes),
          "(device lanes live here when the backend supports them)")
    return 0 if files else 1


if __name__ == "__main__":
    sys.exit(main())
