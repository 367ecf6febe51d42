#!/usr/bin/env python
"""A/B the super-row E-slice extraction and its backward expansion+scatter
(round 4: the compiled train step materializes a transposed (M, k, E)
intermediate for the one-hot einsum — reshape.129, ~0.39 ms/step — and the
backward scatter fusion costs ~0.71 ms/step; HLO mapping in
logs/inspect_hlo_r4.log).

Variants, timed in-scan (the training regime) with RTT subtracted:

forward extraction  (lines (M, k·E), sub (M,) → out (M, E)):
  A. one-hot einsum over the (M, k, E) reshape            [current]
  B. take_along_axis on the 2-D lines (indices sub·E+e)
bwd expand+scatter  (g (M, E) → grad (N2, k·E)):
  A. one-hot outer-product expand to (M, k·E), 1-D row scatter  [current]
  C. lax.scatter-add with (sup, sub·E) 2-D starts and (1, E) windows

Usage: python scripts/measure_extraction_variants.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

M, K, E, N2 = 53248, 12, 10, 110505


def _force(x):
    import jax
    jax.device_get(x)


def scan_time(op, *args, iters=40, reps=3, rtt=None):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*args):
        def body(carry, _):
            out = op(*args, carry)
            return jnp.sum(out).astype(jnp.float32) * jnp.float32(1e-30), None
        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return carry

    _force(run(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(run(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return max(ts[len(ts) // 2] - (rtt or 0.0), 1e-9) / iters


def main():
    import jax
    import jax.numpy as jnp

    from xsdeepfwfm_deprecated_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    rng = np.random.default_rng(0)
    lines = jax.device_put(rng.normal(size=(M, K * E)).astype(np.float32))
    sub = jax.device_put(rng.integers(0, K, size=M).astype(np.int32))
    sup = jax.device_put(rng.integers(0, N2, size=M).astype(np.int32))
    g = jax.device_put(rng.normal(size=(M, E)).astype(np.float32))

    # rtt
    null = jax.jit(lambda x: x + 1.0)
    z = jax.device_put(np.float32(0.0))
    _force(null(z))
    ts = []
    for _ in range(9):
        t0 = time.perf_counter(); _force(null(z)); ts.append(time.perf_counter() - t0)
    ts.sort(); rtt = ts[len(ts) // 2]
    out = {"rtt_ms": round(rtt * 1e3, 2)}

    def fwd_a(lines, sub, c):
        l3 = (lines + c).reshape(M, K, E)
        oh = jax.nn.one_hot(sub, K, dtype=lines.dtype)
        return jnp.einsum("mk,mke->me", oh, l3)

    def fwd_b(lines, sub, c):
        idx2 = sub[:, None] * E + jnp.arange(E, dtype=sub.dtype)[None, :]
        return jnp.take_along_axis(lines + c, idx2, axis=1)

    va = scan_time(fwd_a, lines, sub, rtt=rtt)
    vb = scan_time(fwd_b, lines, sub, rtt=rtt)
    # correctness
    np.testing.assert_allclose(np.asarray(fwd_a(lines, sub, 0.0)),
                               np.asarray(fwd_b(lines, sub, 0.0)),
                               rtol=1e-6, atol=1e-6)
    out["fwd_einsum_ms"] = round(va * 1e3, 3)
    out["fwd_take_along_ms"] = round(vb * 1e3, 3)

    def bwd_a(g, sub, sup, c):
        oh = jax.nn.one_hot(sub, K, dtype=g.dtype)
        upd = jnp.einsum("mk,me->mke", oh, g + c).reshape(M, K * E)
        z = jnp.zeros((N2, K * E), g.dtype)
        return z.at[sup].add(upd)

    def bwd_c(g, sub, sup, c):
        z = jnp.zeros((N2, K * E), g.dtype)
        idx = jnp.stack([sup, sub * E], axis=1)              # (M, 2) starts
        dnums = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1,), inserted_window_dims=(0,),
            scatter_dims_to_operand_dims=(0, 1))
        return jax.lax.scatter_add(
            z, idx, g + c, dnums, indices_are_sorted=False,
            unique_indices=False)

    wa = scan_time(bwd_a, g, sub, sup, rtt=rtt)
    wc = scan_time(bwd_c, g, sub, sup, rtt=rtt)
    np.testing.assert_allclose(np.asarray(bwd_a(g, sub, sup, 0.0)),
                               np.asarray(bwd_c(g, sub, sup, 0.0)),
                               rtol=1e-4, atol=1e-4)
    out["bwd_onehot_scatter_ms"] = round(wa * 1e3, 3)
    out["bwd_2d_scatter_ms"] = round(wc * 1e3, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
