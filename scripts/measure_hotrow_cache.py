#!/usr/bin/env python
"""Feasibility measurement for a hot-row VMEM cache on the serving gather
(VERDICT r3 #3). The proposal: keep the top-K rows (zipf-hot) in a small
VMEM-resident table and gather cold rows from HBM.

The decision hinges on measured per-row costs (out-of-scan, marginal
protocol, b=8192×26 = 213k rows):

1. gather from the FULL packed table, per-field zipf indices  (status quo)
2. gather from a VMEM-sized 8192-row table (the hot-path cost ceiling)
3. the compaction machinery a hot/cold split needs: sort_key_val of 213k
   int32 keys + a 32k-row scatter-combine

If (2) + (3) + a 32k cold gather don't beat (1), the cache cannot win and is
recorded as measured-unprofitable. Every number D2H-forced.

Usage: python scripts/measure_hotrow_cache.py
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from xsdeepfwfm_deprecated_tpu.utils import enable_compilation_cache
    from xsdeepfwfm_deprecated_tpu.utils.profiling import marginal_timeit
    enable_compilation_cache()

    cfg = _flagship(full_criteo=True)
    rng = np.random.default_rng(0)
    n_rows = sum(cfg.feature_sizes)
    table = jax.device_put(rng.normal(size=(n_rows, 10)).astype(np.float32))
    hot = jax.device_put(rng.normal(size=(8192, 10)).astype(np.float32))
    M = 8192 * 26
    out = {}

    # per-field zipf-ish indices (the serving distribution), flattened+offset
    offs = np.cumsum([0] + [s for s in cfg.feature_sizes[13:-1]])
    idx_sets = []
    for k in range(16):
        cols = []
        for f, s in enumerate(cfg.feature_sizes[13:]):
            r = np.minimum((rng.pareto(1.05, size=8192) * 1).astype(np.int64), s - 1)
            cols.append((r + offs[f]).astype(np.int32))
        idx_sets.append(jax.device_put(np.stack(cols, 1).reshape(-1)))

    dt_full = marginal_timeit(lambda t, i: jnp.take(t, i, axis=0),
                              table, [(i,) for i in idx_sets])
    out["full_table_gather_ms"] = round(dt_full * 1e3, 3)
    out["full_ns_per_row"] = round(dt_full / M * 1e9, 2)

    hot_sets = [jax.device_put(np.asarray(rng.integers(0, 8192, M), np.int32))
                for _ in range(16)]
    dt_hot = marginal_timeit(lambda t, i: jnp.take(t, i, axis=0),
                             hot, [(i,) for i in hot_sets])
    out["hot8192_gather_ms"] = round(dt_hot * 1e3, 3)
    out["hot_ns_per_row"] = round(dt_hot / M * 1e9, 2)

    iota = jnp.arange(M, dtype=jnp.int32)

    def sort_compact(t, i):
        flag = (i >= 8192).astype(jnp.int32)       # cold-first order
        _, pos = jax.lax.sort_key_val(flag, iota)
        cold_pos = pos[:32768]
        cold_rows = jnp.take(t, jnp.take(i, cold_pos, axis=0), axis=0)
        base = jnp.zeros((M, 10), jnp.float32)
        return base.at[cold_pos].set(cold_rows)

    dt_mach = marginal_timeit(sort_compact, table, [(i,) for i in idx_sets])
    out["sort_compact_scatter_ms"] = round(dt_mach * 1e3, 3)

    cache_total = dt_hot + dt_mach
    out["cache_path_total_ms"] = round(cache_total * 1e3, 3)
    out["verdict"] = ("VIABLE" if cache_total < dt_full * 0.8
                      else "UNPROFITABLE")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
