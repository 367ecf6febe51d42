#!/usr/bin/env python
"""Re-measure the TPU cost-model constants on the attached device and diff
them against the values baked into the code (VERDICT r3 weak #6: the measured
constants — gather fast-path knee, routed-vs-naive crossover, scatter window
win, quantile-vs-bisection crossover — were magic numbers nothing re-checks;
a platform/XLA drift would silently flip dispatch decisions the wrong way).

Also measures the round-4 super-row layout deltas (ops/superpack.py): the
lane-padding tax on (N, 10) dense passes, packed-vs-flat gather/scatter, and
the Adam-chain cost in both layouts — the numbers behind the design.

Every timing forces completion via ``jax.device_get`` of a scalar
(``block_until_ready`` returns early on this platform — CLAUDE.md).

Usage:
  python scripts/recalibrate_cost_model.py [--quick] [--json OUT.json]

Checked constants:
  ops/embedding.FAST_GATHER_BYTES   (2**19)  — gather/scatter fast-path knee
  ops/embedding.ROUTED_FWD_MIN_ROWS (200000) — routed-vs-naive crossover
  compression/pruning.BISECT_SIZE   (1<<14)  — quantile-vs-bisection switch
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _force(x):
    import jax
    jax.device_get(x)


_RTT = None


def dispatch_rtt():
    """Median null-dispatch + D2H round trip — subtracted from every scan
    measurement (through the remote tunnel this is ~tens of ms and swamped
    small-op timings in the first round-4 run)."""
    global _RTT
    if _RTT is not None:
        return _RTT
    import jax
    import jax.numpy as jnp
    null = jax.jit(lambda x: x + 1.0)
    z = jax.device_put(np.float32(0.0))
    _force(null(z))
    ts = []
    for _ in range(9):
        t0 = time.perf_counter()
        _force(null(z))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    _RTT = ts[len(ts) // 2]
    print(f"[dispatch_rtt] {_RTT * 1e3:.2f} ms", flush=True)
    return _RTT


def scan_time(op, *args, iters=50, reps=3):
    """Seconds per op inside a lax.scan body (the training-dispatch regime).
    A scalar carry derived from each step's output feeds the next step's
    input — a data dependency XLA cannot hoist or CSE. The dispatch RTT is
    measured separately and subtracted."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*args):
        def body(carry, _):
            out = op(*args, carry)
            return jnp.sum(out).astype(jnp.float32) * jnp.float32(1e-30), None
        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return carry

    rtt = dispatch_rtt()
    _force(run(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(run(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return max(ts[len(ts) // 2] - rtt, 1e-9) / iters


def line_time(op, *args, k1=1, k2=8, reps=5):
    """Seconds per op in straight-line code: marginal cost of one extra
    replica in a single dispatch. Each replica's dummy offset is read from a
    TRACED input array (a Python-literal offset constant-folds and the
    replicas CSE to one — measured 0.0 slopes, round-4 first attempt)."""
    import jax
    import jax.numpy as jnp

    def mk(k):
        @jax.jit
        def run(offs, *args):
            tot = jnp.float32(0.0)
            for i in range(k):
                out = op(*args, offs[i])
                tot = tot + jnp.sum(out).astype(jnp.float32)
            return tot
        return run

    offs = jnp.zeros((max(k1, k2),), jnp.float32)   # zeros at runtime, traced
    r1, r2 = mk(k1), mk(k2)
    _force(r1(offs, *args)); _force(r2(offs, *args))
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); _force(r1(offs, *args)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); _force(r2(offs, *args)); t2s.append(time.perf_counter() - t0)
    return max(min(t2s) - min(t1s), 1e-9) / (k2 - k1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from xsdeepfwfm_deprecated_tpu.ops import embedding as emb
    from xsdeepfwfm_deprecated_tpu.ops import superpack as sp
    from xsdeepfwfm_deprecated_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    rng = np.random.default_rng(0)
    out = {"platform": jax.devices()[0].platform,
           "device": str(jax.devices()[0])}
    report = []

    def rec(name, **kv):
        out[name] = kv
        report.append((name, kv))
        print(f"[{name}] " + "  ".join(f"{k}={v}" for k, v in kv.items()),
              flush=True)

    M = 213_000 if not args.quick else 50_000   # gathered rows (b8192 × 26)

    # ---- 1. gather ns/row vs operand rows (knee detection), per dtype ------
    knees = {}
    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16"),
                        (jnp.int8, "int8")):
        item = jnp.dtype(dtype).itemsize
        rows_list = [2**16, 2**17, 2**18, 2**19]
        if args.quick:
            rows_list = rows_list[:3]
        res = {}
        for n in rows_list:
            table = jnp.asarray(rng.normal(size=(n, 10)), dtype)
            idx = jnp.asarray(rng.integers(0, n, size=M).astype(np.int32))

            def g(table, idx, c):
                return jnp.take(table, jnp.clip(
                    idx + (c * 0).astype(idx.dtype), 0, n - 1), axis=0)
            dt_scan = scan_time(g, table, idx, iters=40)
            dt_line = line_time(g, table, idx, k2=4)
            res[n] = (dt_scan / M * 1e9, dt_line / M * 1e9)
            rec(f"gather_{name}_{n}rows", bytes_per_lane=n * item,
                scan_ns_per_row=round(res[n][0], 2),
                line_ns_per_row=round(res[n][1], 2))
        # knee: first size whose in-scan cost/row jumps >2× over the smallest
        base = min(v[0] for v in res.values())
        knee_rows = None
        for n in rows_list:
            if res[n][0] > 2 * base:
                knee_rows = n
                break
        knees[name] = (knee_rows * item) if knee_rows else None
        rec(f"knee_{name}", knee_bytes=knees[name],
            configured=emb.FAST_GATHER_BYTES,
            ok=(knees[name] is None or knees[name] >= emb.FAST_GATHER_BYTES))

    # ---- 2. routed-vs-naive crossover (in-scan, full-Criteo field sizes) ---
    from __graft_entry__ import _flagship
    cfg = _flagship(full_criteo=True)
    spec = emb.make_spec(cfg.feature_sizes, cfg.numerical)
    table = jnp.asarray(rng.normal(size=(spec.dense_rows, 10)).astype(np.float32))
    crossover = None
    prev = None
    for b in ([2048, 8192] if args.quick else [2048, 4096, 8192]):
        xi = jnp.asarray(rng.integers(
            0, [s for s in cfg.feature_sizes[13:]], size=(b, 26)).astype(np.int32))
        xv = jnp.ones((b, 13), jnp.float32)
        raw, _ = emb.build_indices(spec, xi, xv)

        def naive(table, raw, c):
            offs = jnp.asarray(spec.dense_offsets, raw.dtype)[None, :]
            idx = jnp.clip(raw + offs + (c * 0).astype(raw.dtype),
                           0, table.shape[0] - 1)
            return jnp.take(table, idx, axis=0)

        def routed(table, raw, c):
            return emb._routed_gather(
                table, spec.dense_offsets, spec.feature_sizes,
                raw + (c * 0).astype(raw.dtype))

        dt_n = scan_time(naive, table, raw, iters=40)
        dt_r = scan_time(routed, table, raw, iters=40)
        rec(f"routed_vs_naive_b{b}", rows=b * 26,
            naive_ms=round(dt_n * 1e3, 3), routed_ms=round(dt_r * 1e3, 3),
            routed_wins=bool(dt_r < dt_n))
        if prev is not None and prev[1] and not (dt_r < dt_n):
            pass
        if dt_r < dt_n and crossover is None:
            crossover = b * 26
        prev = (b, dt_r < dt_n)
    rec("routed_crossover", first_routed_win_rows=crossover,
        configured=emb.ROUTED_FWD_MIN_ROWS)

    # ---- 3. scatter: single vs windowed (in-scan, full-Criteo scale) -------
    upd = jnp.asarray(rng.normal(size=(53_261, 10)).astype(np.float32))
    sidx = jnp.asarray(rng.integers(0, spec.dense_rows, size=53_261).astype(np.int32))

    def scat_single(upd, sidx, c):
        z = jnp.zeros((spec.dense_rows, 10), jnp.float32)
        return z.at[sidx].add(upd + c)

    def scat_windowed(upd, sidx, c):
        return emb._windowed_scatter_add(spec.dense_rows, sidx, upd + c)

    dt_s = scan_time(scat_single, upd, sidx, iters=30)
    dt_w = scan_time(scat_windowed, upd, sidx, iters=30)
    rec("scatter_53k_fullcriteo", single_ms=round(dt_s * 1e3, 3),
        windowed_ms=round(dt_w * 1e3, 3), windowed_wins=bool(dt_w < dt_s))

    # ---- 4. super-row layout deltas (round-4 design numbers) ---------------
    packed = sp.pack_table(table)["packed"]          # (110870, 120)
    flat = table.reshape(-1)                          # (13.3M,) no lane padding

    def adam_chain(p, m, v, g, c):
        g = g + c
        m2 = 0.9 * m + 0.1 * g
        v2 = 0.999 * v + 0.001 * g * g
        return p - 1e-3 * (m2 / 0.5) / (jnp.sqrt(v2 / 0.5) + 1e-8)

    for lname, arr in (("N_E_padded", table), ("superpacked", packed),
                       ("flat_1d", flat)):
        m = jnp.zeros_like(arr); v = jnp.zeros_like(arr); g = jnp.ones_like(arr)
        dt = scan_time(adam_chain, arr, m, v, g, iters=40)
        rec(f"adam_chain_{lname}", shape=str(arr.shape),
            ms=round(dt * 1e3, 3))

    idx = jnp.asarray(rng.integers(0, spec.dense_rows, size=M).astype(np.int32))

    def g_flatlayout(table, idx, c):
        return emb._fast_take_impl(table, idx + (c * 0).astype(idx.dtype))

    def g_super(packed, idx, c):
        return sp.packed_take_rows(12, spec.dense_rows, packed,
                                   idx + (c * 0).astype(idx.dtype))

    dt_gf_s = scan_time(g_flatlayout, table, idx, iters=40)
    dt_gf_l = line_time(g_flatlayout, table, idx, k2=4)
    dt_gs_s = scan_time(g_super, packed, idx, iters=40)
    dt_gs_l = line_time(g_super, packed, idx, k2=4)
    rec("gather_213k_flat_vs_super",
        flat_scan_ms=round(dt_gf_s * 1e3, 3), flat_line_ms=round(dt_gf_l * 1e3, 3),
        super_scan_ms=round(dt_gs_s * 1e3, 3), super_line_ms=round(dt_gs_l * 1e3, 3),
        super_scan_ns_per_row=round(dt_gs_s / M * 1e9, 2))

    sup = sidx // 12
    sub = sidx - sup * 12
    oh = jax.nn.one_hot(sub, 12, dtype=jnp.float32)
    upd_super = jnp.einsum("mk,me->mke", oh, upd).reshape(-1, 120)

    def scat_super(upd_super, sup, c):
        return emb._windowed_scatter_add(packed.shape[0], sup, upd_super + c)

    dt_ss = scan_time(scat_super, upd_super, sup, iters=30)
    rec("scatter_53k_super", ms=round(dt_ss * 1e3, 3),
        vs_flat_windowed_ms=round(dt_w * 1e3, 3))

    # ---- 5. quantile vs bisection threshold crossover ----------------------
    from xsdeepfwfm_deprecated_tpu.compression import pruning as pr
    for n in ([1 << 14, 1 << 17] if args.quick else [1 << 12, 1 << 14, 1 << 17, 1 << 20]):
        w = jnp.asarray(rng.normal(size=n).astype(np.float32))

        def via_quantile(w, c):
            return jnp.quantile(jnp.abs(w + c), 0.9)[None]

        def via_bisect(w, c):
            return pr._bisect_threshold(jnp.abs(w + c), jnp.float32(0.9))[None]

        dt_q = scan_time(via_quantile, w, iters=30)
        dt_b = scan_time(via_bisect, w, iters=30)
        rec(f"threshold_{n}", quantile_ms=round(dt_q * 1e3, 3),
            bisect_ms=round(dt_b * 1e3, 3), bisect_wins=bool(dt_b < dt_q),
            configured_switch=pr.BISECT_SIZE)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
