#!/usr/bin/env python
"""Full-Criteo-row-count host input-pipeline proof (VERDICT r3 #6).

Generates a 41.3M-row full-Criteo-dims synthetic dataset on disk (the paper's
Table 3 row count; per-field cardinalities from
``/root/reference/latency/criteo_latency.cpp:38-39``), then:

1. measures the one-time CSV→binary ingest rate through the NATIVE C++ loader
   (``native/dataloader``) on a sample shard — the offline-preprocessing leg;
2. streams ONE full training epoch through
   :class:`xsdeepfwfm_deprecated_tpu.data.sharded_input.ShardedBinPipeline`
   (host-only) and records rows/s — target ≥ 1M rows/s, i.e. faster than a
   ~5 ms b=2048 TPU train step consumes rows (~0.4M rows/s);
3. with ``--tpu``, feeds the stream into the real multi-step train dispatch
   for a timed slice of the epoch and reports epoch-wall vs steps×step-time
   (the host must not be the bottleneck: wall within 15% of the step budget).

Dataset lives in ``--dir`` (default /tmp/synth41m_bin, ~6.8 GB; /tmp is
scratch — regenerate as needed, ~10 min).

Usage:
  python scripts/host_pipeline_41m.py --rows 41300000          # generate+host
  python scripts/host_pipeline_41m.py --tpu                    # + TPU leg
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from synthetic_scale_run import FULL_CRITEO_CAT_SIZES, _zipf_cdfs  # noqa: E402


def generate(dirpath: str, rows: int, seed: int = 0, chunk: int = 1_000_000):
    """Chunked zipf-sampled full-Criteo-dims rows straight into the binary
    layout. Labels from a cheap planted LINEAR logit (pipeline throughput is
    the subject here, not AUC — the 10M-row quality runs use the full planted
    model, scripts/synthetic_scale_run.py)."""
    from xsdeepfwfm_deprecated_tpu.data.sharded_input import ShardedBinPipeline
    n_num, n_cat = 13, 26
    cat_sizes = FULL_CRITEO_CAT_SIZES
    rng = np.random.default_rng(seed)
    w_num = (rng.normal(size=n_num) * 0.3).astype(np.float32)
    w_cat = [rng.normal(size=s).astype(np.float32) * 0.4 for s in cat_sizes]
    cdfs = _zipf_cdfs(cat_sizes)
    writer = ShardedBinPipeline.create(dirpath, rows, n_num, n_cat)
    t0 = time.time()
    for lo in range(0, rows, chunk):
        hi = min(rows, lo + chunk)
        n = hi - lo
        xi = np.empty((n, n_cat), np.int32)
        for f in range(n_cat):
            xi[:, f] = np.searchsorted(cdfs[f], rng.random(n)).astype(np.int32)
        xv = rng.normal(size=(n, n_num)).astype(np.float32)
        logit = xv @ w_num
        for f in range(n_cat):
            logit += w_cat[f][xi[:, f]]
        logit = logit * 1.2 - 1.1
        y = (rng.random(n) < 1.0 / (1.0 + np.exp(-logit))).astype(np.float32)
        writer["index"][lo:hi] = xi
        writer["value"][lo:hi] = xv
        writer["label"][lo:hi] = y
        print(f"  generated {hi:,}/{rows:,} rows "
              f"({hi / (time.time() - t0):,.0f} rows/s)", flush=True)
    for a in writer.values():
        a.flush()
    return [1] * n_num + cat_sizes


def native_ingest_rate(dirpath: str, sample_rows: int = 2_000_000) -> dict:
    """CSV→arrays through the native C++ loader on a sample shard (the
    offline leg: reference text formats → binary)."""
    from xsdeepfwfm_deprecated_tpu.data import native_loader
    from xsdeepfwfm_deprecated_tpu.data.sharded_input import ShardedBinPipeline
    if not native_loader.available():
        return {"native_loader": "unavailable"}
    p = ShardedBinPipeline(dirpath)
    n = min(sample_rows, p.local_rows)
    csv_path = os.path.join(dirpath, "sample_shard.csv")
    lab = np.asarray(p.arrays["label"][:n])
    val = np.asarray(p.arrays["value"][:n])
    idx = np.asarray(p.arrays["index"][:n])
    mat = np.concatenate([lab[:, None], val, idx.astype(np.float32)], axis=1)
    np.savetxt(csv_path, mat, fmt="%.4g", delimiter=",")
    size_mb = os.path.getsize(csv_path) / 1e6
    t0 = time.time()
    label, value, index = native_loader.read_csv_arrays(
        csv_path, list(range(1, 14)))
    dt = time.time() - t0
    os.remove(csv_path)
    assert label.shape[0] == n
    return {"native_csv_rows_per_s": round(n / dt, 0),
            "native_csv_mb_per_s": round(size_mb / dt, 1)}


def host_stream_rate(dirpath: str, batch: int, seed: int = 3) -> dict:
    from xsdeepfwfm_deprecated_tpu.data.sharded_input import ShardedBinPipeline
    p = ShardedBinPipeline(dirpath)
    t0 = time.time()
    rows = 0
    for b in p.epoch_batches(batch, seed=seed, epoch=0):
        rows += b["label"].shape[0]
    dt = time.time() - t0
    return {"host_rows": rows, "host_epoch_s": round(dt, 1),
            "host_rows_per_s": round(rows / dt, 0)}


def tpu_epoch(dirpath: str, feature_sizes, batch: int, k_steps: int,
              max_steps: int) -> dict:
    """Feed the stream into the real jitted multi-step train dispatch; report
    wall time vs the pure-step budget for the same step count."""
    import jax
    import jax.numpy as jnp

    from xsdeepfwfm_deprecated_tpu.config import ModelConfig, TrainConfig
    from xsdeepfwfm_deprecated_tpu.data.sharded_input import ShardedBinPipeline
    from xsdeepfwfm_deprecated_tpu.models import deepfwfm
    from xsdeepfwfm_deprecated_tpu.ops import superpack
    from xsdeepfwfm_deprecated_tpu.train import trainer as T

    mcfg = ModelConfig(field_size=39, feature_sizes=tuple(feature_sizes),
                       numerical=13, embedding_size=10, use_fwfm=True,
                       use_deep=True, use_lw=True, use_fwlw=True)
    tcfg = TrainConfig(batch_size=batch, steps_per_call=k_steps)
    spec = deepfwfm.make_embedding_spec(mcfg)
    params = jax.jit(lambda k: deepfwfm.init_params(k, mcfg))(
        jax.random.PRNGKey(0))
    params = superpack.pack_params(params, spec)
    opt = T.make_optimizer(tcfg)
    opt_state = opt.init(params)
    from functools import partial
    fwd = partial(deepfwfm.forward, lookup_fn=superpack.super_lookup)
    multi = T.make_multi_step(mcfg, tcfg, opt, forward_fn=fwd)

    p = ShardedBinPipeline(dirpath)
    key = jax.random.PRNGKey(1)
    zeros_k = jnp.zeros((k_steps, batch), jnp.float32)
    ones_k = jnp.ones((k_steps, batch), jnp.float32)

    group = batch * k_steps
    steps = 0
    loss = None

    def grouped():
        buf = {"index": [], "value": [], "label": []}
        have = 0
        for b in p.epoch_batches(batch, seed=4, epoch=0):
            for k in buf:
                buf[k].append(b[k])
            have += batch
            if have < group:
                continue
            yield {
                "xi": np.concatenate(buf["index"]).reshape(k_steps, batch, -1),
                "xv": np.concatenate(buf["value"]).reshape(k_steps, batch, -1),
                "y": np.concatenate(buf["label"]).reshape(k_steps, batch),
            }
            buf = {k: [] for k in buf}
            have = 0

    # the real trainer feed: H2D overlapped with compute (data/batching.
    # prefetch_to_device) — a synchronous per-dispatch device_put through the
    # remote tunnel measures the RTT, not the host pipeline (first round-4
    # attempt: 250 dispatches x ~30 ms RTT swamped the 12 s step budget)
    from xsdeepfwfm_deprecated_tpu.data.batching import prefetch_to_device
    t0 = time.time()
    last = None
    for g in prefetch_to_device(grouped(), size=3):
        key, sub = jax.random.split(key)
        params, opt_state, loss = multi(
            params, opt_state, g["xi"], g["xv"], g["y"], ones_k, sub, zeros_k)
        last = g
        steps += k_steps
        if steps >= max_steps:
            break
    jax.device_get(jnp.sum(loss))   # force completion (block_until_ready lies)
    wall = time.time() - t0
    # pure-step budget: the same dispatch timed back-to-back on cached inputs
    t1 = time.time()
    reps = 5
    for _ in range(reps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = multi(
            params, opt_state, last["xi"], last["xv"], last["y"],
            ones_k, sub, zeros_k)
    jax.device_get(jnp.sum(loss))
    step_s = (time.time() - t1) / (reps * k_steps)
    budget = steps * step_s
    return {"tpu_steps": steps, "tpu_wall_s": round(wall, 1),
            "tpu_step_ms": round(step_s * 1e3, 2),
            "tpu_step_budget_s": round(budget, 1),
            "wall_over_budget": round(wall / budget, 3),
            "host_is_bottleneck": bool(wall > 1.15 * budget)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=41_300_000)
    ap.add_argument("--dir", default="/tmp/synth41m_bin")
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--k-steps", type=int, default=8)
    ap.add_argument("--max-steps", type=int, default=2000)
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--skip-native", action="store_true")
    args = ap.parse_args()

    out = {"rows": args.rows}
    if not os.path.exists(os.path.join(args.dir, "label.npy")):
        print(f"generating {args.rows:,} rows into {args.dir} ...", flush=True)
        sizes = generate(args.dir, args.rows)
        np.save(os.path.join(args.dir, "feature_sizes.npy"), np.asarray(sizes))
    sizes = np.load(os.path.join(args.dir, "feature_sizes.npy")).tolist()

    if not args.skip_native:
        out.update(native_ingest_rate(args.dir))
        print(json.dumps(out), flush=True)

    out.update(host_stream_rate(args.dir, args.batch))
    print(json.dumps(out), flush=True)

    if args.tpu:
        from xsdeepfwfm_deprecated_tpu.utils import enable_compilation_cache
        enable_compilation_cache()
        out.update(tpu_epoch(args.dir, sizes, args.batch, args.k_steps,
                             args.max_steps))
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
