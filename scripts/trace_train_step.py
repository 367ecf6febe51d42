#!/usr/bin/env python
"""Capture a device trace of the K-step training dispatch and break the step
time down by XLA op category (round 4: the measured 4.39 ms b=2048 step has
~3.6 ms beyond the gather/scatter/Adam micro-costs; the trace says where).

Writes the trace under --out and prints a per-op-category table parsed from
the chrome-trace export's "XLA Ops" device lane.

Usage: python scripts/trace_train_step.py [--batch 2048] [--k 16]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def capture(out_dir: str, batch: int, k: int):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from functools import partial

    from xsdeepfwfm_deprecated_tpu.config import TrainConfig
    from xsdeepfwfm_deprecated_tpu.models import deepfwfm
    from xsdeepfwfm_deprecated_tpu.ops import superpack
    from xsdeepfwfm_deprecated_tpu.train.trainer import (make_multi_step,
                                                         make_optimizer)
    from xsdeepfwfm_deprecated_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    cfg = _flagship(full_criteo=True)
    tcfg = TrainConfig(batch_size=batch, steps_per_call=k)
    spec = deepfwfm.make_embedding_spec(cfg)
    params = superpack.pack_params(
        jax.jit(lambda s: deepfwfm.init_params(s, cfg))(jax.random.PRNGKey(0)),
        spec)
    optimizer = make_optimizer(tcfg)
    opt_state = optimizer.init(params)
    multi = make_multi_step(cfg, tcfg, optimizer,
                            forward_fn=partial(deepfwfm.forward,
                                               lookup_fn=superpack.super_lookup))
    rng = np.random.default_rng(0)
    xi = jnp.asarray(rng.integers(0, [s for s in cfg.feature_sizes[13:]],
                                  size=(k, batch, 26)).astype(np.int32))
    xv = jnp.asarray(rng.normal(size=(k, batch, 13)).astype(np.float32))
    y = jnp.asarray((rng.random((k, batch)) < 0.3).astype(np.float32))
    mask = jnp.ones((k, batch), jnp.float32)
    key = jax.random.PRNGKey(1)
    zeros_t = jnp.zeros((k, batch), jnp.float32)

    p, o = params, opt_state
    p, o, losses = multi(p, o, xi, xv, y, mask, key, zeros_t)
    jax.device_get(jnp.sum(losses))           # compile + warm outside trace

    os.makedirs(out_dir, exist_ok=True)
    jax.profiler.start_trace(out_dir)
    p, o, losses = multi(p, o, xi, xv, y, mask, key, zeros_t)
    jax.device_get(jnp.sum(losses))
    jax.profiler.stop_trace()


CATEGORIES = (
    ("gather", ("gather",)),
    ("scatter", ("scatter",)),
    ("fusion/elementwise", ("fusion", "add", "multiply", "subtract", "divide",
                            "rsqrt", "select", "compare", "convert", "tanh",
                            "exponential", "maximum")),
    ("matmul/conv", ("dot", "convolution")),
    ("copy/reshape/transpose", ("copy", "reshape", "transpose", "bitcast",
                                "slice", "concatenate", "dynamic")),
    ("rng", ("rng", "threefry", "iota")),
    ("reduce", ("reduce", "sort")),
)


def analyze(out_dir: str, k: int):
    traces = glob.glob(os.path.join(out_dir, "**", "*.trace.json.gz"),
                       recursive=True)
    assert traces, f"no trace under {out_dir}"
    with gzip.open(sorted(traces)[-1], "rt") as f:
        data = json.load(f)
    ev = data["traceEvents"]
    # find the device "XLA Ops" lane (pid of /device:TPU, tid named XLA Ops)
    dev_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    op_tids = {(e["pid"], e["tid"]) for e in ev
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e.get("args", {}).get("name") == "XLA Ops"
               and e["pid"] in dev_pids}
    # EXCLUSIVE per-op time: `while`/`conditional` events span their whole
    # body, so naive summing double-counts. Sort each lane's events and
    # subtract the time covered by nested children.
    lanes = collections.defaultdict(list)
    for e in ev:
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tids:
            lanes[(e["pid"], e["tid"])].append(
                (float(e["ts"]), float(e.get("dur", 0.0)), e["name"]))
    durs = collections.Counter()
    total = 0.0
    for lane in lanes.values():
        events = [(ts, ts + d, nm) for ts, d, nm in lane]
        events.sort(key=lambda x: (x[0], -(x[1] - x[0])))
        st = []
        for s, e_, nm in events:
            while st and st[-1][1] <= s + 1e-9:
                fs, fe, fnm, cover = st.pop()
                excl = max((fe - fs) - cover, 0.0)
                _account2(durs, fnm, excl)
                total += excl
                if st:
                    st[-1][3] += fe - fs
            st.append([s, e_, nm, 0.0])
        while st:
            fs, fe, fnm, cover = st.pop()
            excl = max((fe - fs) - cover, 0.0)
            _account2(durs, fnm, excl)
            total += excl
            if st:
                st[-1][3] += fe - fs
    print(f"device XLA-op EXCLUSIVE time in traced dispatch: {total/1e3:.3f} ms "
          f"({total/1e3/k:.3f} ms/step over {k} steps)")
    for cat, dur in durs.most_common(16):
        print(f"  {cat:<28s} {dur/1e3:8.3f} ms  {100*dur/max(total,1e-9):5.1f}%")
    return durs, total


def _account2(durs, name, excl):
    nm = name.lower()
    for cat, keys in CATEGORIES:
        if any(kk in nm for kk in keys):
            durs[cat] += excl
            return
    durs["other:" + nm.split(".")[0]] += excl


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--out", default="traces/r4_train_step")
    ap.add_argument("--analyze-only", action="store_true")
    args = ap.parse_args()
    if not args.analyze_only:
        capture(args.out, args.batch, args.k)
    analyze(args.out, args.k)


if __name__ == "__main__":
    main()
