#!/usr/bin/env python
"""Field-grouped serving gather: can splitting the packed table into
sub-knee groups beat the single full-table gather? (round-5 follow-up to
reconcile_int8_gather.py)

The int8 reconciliation showed the gather fast-path knee sits at ~1 MB of
PER-LANE-COLUMN bytes regardless of dtype: below it rows fetch at
~1.4-1.9 ns, above at ~4.1-4.9 ns. The full-Criteo packed f32 table is
5.3 MB/lane (past the knee) — but serving indices are PER-FIELD, so the
table can be statically pre-split into contiguous FIELD GROUPS, each under
the knee, and each group gathered with only its own fields' indices: same
total rows fetched, no routing, no masking — the sub-knee rate everywhere,
IF the per-gather overhead of G gathers doesn't eat the win.

Measures (marginal protocol, b=8192, distinct per-field index sets):
  * single packed gather (status quo) for f32 and int8-inline-scale rows;
  * G-group split for G ∈ {2, 4, 7, 13, 26}, groups built greedily so each
    group's per-lane bytes ≤ ~0.9 MB (f32) — for int8 every group is tiny.

Reference counterpart: the 26 per-field ``nn.Embedding`` lookups this
framework collapsed into one gather (``model/DeepFMs.py:296,311``); this
asks whether the OPTIMAL grouping on TPU is somewhere between 1 and 26.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from synthetic_scale_run import FULL_CRITEO_CAT_SIZES  # noqa: E402

B = 8192
F = 26
E = 10
K2 = 16


def make_groups(sizes, max_lane_bytes, itemsize):
    """Greedy contiguous field groups with per-lane bytes ≤ max_lane_bytes.
    A single field larger than the cap gets its own group."""
    groups, cur, cur_rows = [], [], 0
    for f, s in enumerate(sizes):
        if cur and (cur_rows + s) * itemsize > max_lane_bytes:
            groups.append(cur)
            cur, cur_rows = [], 0
        cur.append(f)
        cur_rows += s
    if cur:
        groups.append(cur)
    return groups


def main():
    import jax
    import jax.numpy as jnp

    from xsdeepfwfm_deprecated_tpu.utils import enable_compilation_cache
    from xsdeepfwfm_deprecated_tpu.utils.profiling import marginal_timeit
    enable_compilation_cache()

    rng = np.random.default_rng(0)
    sizes = np.asarray(FULL_CRITEO_CAT_SIZES)
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    n_rows = int(sizes.sum())
    rows_per_call = B * F

    idx_sets = []   # per-field LOCAL indices (B, F)
    for _ in range(K2):
        idx_sets.append((rng.random((B, F)) * sizes).astype(np.int32))

    table_f32 = jnp.asarray(rng.normal(size=(n_rows, E)).astype(np.float32))
    q = rng.integers(-127, 128, size=(n_rows, E + 4), dtype=np.int8)
    table_qs = jnp.asarray(q)

    out = {"rows_per_call": rows_per_call, "arms": []}

    def run_arm(name, tab, group_lists):
        # pre-split the table outside jit: one operand per group
        subs = [tab[offsets[g[0]]:offsets[g[-1]] + sizes[g[-1]]]
                for g in group_lists]
        goff = [offsets[g[0]] for g in group_lists]
        acc_t = jnp.int32 if tab.dtype == jnp.int8 else tab.dtype

        def fn(subs, flat_idx):
            # flat_idx: (B, F) GLOBAL packed indices
            tot = None
            for sub, g, off in zip(subs, group_lists, goff):
                li = flat_idx[:, np.asarray(g)] - off
                got = jnp.sum(jnp.take(sub, li.reshape(-1), axis=0
                                       ).astype(acc_t))
                tot = got if tot is None else tot + got
            return tot

        inputs = [(jnp.asarray((ix + offsets).astype(np.int32)),)
                  for ix in idx_sets]
        t = marginal_timeit(fn, subs, inputs, reps=7)
        row = {"arm": name, "groups": len(group_lists),
               "ms": round(t * 1e3, 3),
               "ns_per_row": round(t * 1e9 / rows_per_call, 2),
               "max_group_lane_mb": round(
                   max(int(s.shape[0]) for s in subs)
                   * tab.dtype.itemsize / 1e6, 2)}
        print(json.dumps(row), flush=True)
        out["arms"].append(row)

    all_fields = [list(range(F))]
    per_field = [[f] for f in range(F)]
    for dtype_name, tab, item in (("f32", table_f32, 4), ("int8", table_qs, 1)):
        run_arm(f"{dtype_name}_single", tab, all_fields)
        for cap_mb in (0.9, 0.45, 0.22):
            g = make_groups(sizes, cap_mb * 1e6, item)
            if 1 < len(g) < F:
                run_arm(f"{dtype_name}_cap{cap_mb}", tab, g)
        run_arm(f"{dtype_name}_per_field", tab, per_field)

    best = min(out["arms"], key=lambda r: r["ms"])
    out["best"] = best
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"total {time.time()-t0:.0f}s")
