"""DeepLight structural pruning: magnitude pruning with the adaptive schedule.

Reference semantics (``model/DeepFMs.py:647-674`` + ``binary_search_threshold``
``:807-823``), replicated exactly:

* schedule ``s_t = S · (1 − 0.99^(t/100))`` on the post-warm-up iteration count;
* three independently-rated groups:
  (a) ALL 2nd-order embedding tables thresholded **globally** at ``s_t·emb_r``
      (the reference stacks every per-field table — our packed table already is
      that stack; QR quotient/remainder tables are included, as the name-match
      over ``fm_2nd_embeddings`` catches ``weight_q``/``weight_r`` too);
  (b) every DNN hidden-layer weight **per-layer** at ``s_t`` — including the
      ``fwfm_linear`` (fwlw) weight, which the reference's
      ``'linear' in name and 'weight' in name`` filter also catches; biases and
      the fc head are NOT pruned;
  (c) the field matrix R thresholded on its symmetrized sum at ``s_t·emb_corr``.
* weights are **zeroed in place, masks are not persistent** — between prune
  refreshes the optimizer can regrow pruned weights (reference zeroes
  ``param.data`` with no mask). We therefore recompute and re-apply thresholds
  every ``prune_interval`` steps rather than freezing masks.

Threshold search: for small tensors ``jnp.quantile(|w|, s)`` (exact, one XLA
reduction); for multi-million-row embedding stacks a value-range **bisection**
— the reference's own algorithm (``binary_search_threshold``,
``model/DeepFMs.py:807-823``) — because on TPU 40 bandwidth-bound comparison
passes over the array (~40·65 µs for Criteo's 53 MB emb2) beat the O(n log²n)
bitonic sort a quantile needs (measured: the sort made pruned epochs ~1.9×
dense; bisection brings the refresh to low-ms). 40 halvings of [0, max|w|]
pin the threshold to max·2⁻⁴⁰ — far inside the reference's ±1e-4 sparsity
tolerance.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp

from ..config import ModelConfig

# above this many elements, threshold search switches from sort-based quantile
# to the bandwidth-bound bisection (reference binary_search_threshold).
# 16K keeps exact quantiles for the small tensors (field_cov, fwlw, first MLP
# rows) while the 156K-160K deep-layer weights use bisection — a TPU bitonic
# sort of 160K elements costs ~ms while 40 bisection passes cost ~µs, and at
# prune_interval=10 the refresh runs 390×/epoch at Criteo scale (this was the
# bulk of the pruned-epoch overhead; bisection is also the reference's own
# algorithm, model/DeepFMs.py:807-823).
BISECT_SIZE = 1 << 14
BISECT_ITERS = 40


def _bisect_threshold(absw: jax.Array, target: jax.Array) -> jax.Array:
    """Reference ``binary_search_threshold`` (``model/DeepFMs.py:807-823``):
    halve [lo, hi] on the pruned fraction ``mean(|w| < mid)`` vs target.

    Halving happens in LOG-magnitude space (round-5 fix). Never-sampled
    embedding rows decay under Adam+L2 at ~6%/step (the L2 gradient is their
    only gradient and Adam normalizes it), so by a few hundred post-warm
    steps they cluster at |w| ~ 1e-18..1e-31. A LINEAR 40-halving search has
    a resolution floor of ``max·2⁻⁴⁰ ≈ 5e-13`` — every representable
    threshold sits ABOVE that cluster, so the search wiped it wholesale
    (measured on the 200k pruned golden: total sparsity exploded 1% → 35% →
    75% in epochs 4→6 while the schedule asked for 2-4%; the reference's
    100-iteration linear search resolves to ~8e-29 and prunes only the
    target fraction — trajectories diverged). Geometric halving of
    [max·2⁻¹²⁰, max] reaches any f32-normal threshold in the same 40
    bandwidth passes: after 40 iters the log2-range is 120·2⁻⁴⁰ ≈ 1e-10,
    i.e. exact-quantile resolution everywhere in the magnitude spectrum."""
    hi = jnp.maximum(jnp.max(absw), jnp.float32(1e-30))
    log_hi = jnp.log(hi)
    log_lo = log_hi + jnp.float32(-120.0 * 0.6931472)   # hi·2⁻¹²⁰

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        frac = jnp.mean((absw < jnp.exp(mid)).astype(jnp.float32))
        go_up = frac < target
        return (jnp.where(go_up, mid, lo), jnp.where(go_up, hi, mid))

    log_lo, log_hi = jax.lax.fori_loop(0, BISECT_ITERS, body, (log_lo, log_hi))
    return jnp.exp(0.5 * (log_lo + log_hi))


def magnitude_threshold(w: jax.Array, target_sparsity: jax.Array) -> jax.Array:
    """|w| value below which ``target_sparsity`` of entries fall.

    A zero target returns threshold 0.0 exactly (prune NOTHING) — the
    reference's 100-iteration bisection underflows to 0 there
    (``model/DeepFMs.py:807-823``), while a 40-iteration one leaves
    ``max·2⁻⁴⁰ ≈ 5e-13``, which silently wipes never-sampled embedding rows
    that Adam+L2 parks at |p| ~ 1e-31 (observed: an ``emb_r=0`` run reported
    81% embedding sparsity)."""
    target = jnp.clip(target_sparsity, 0.0, 1.0)
    absw = jnp.abs(w.ravel())
    thr = (_bisect_threshold(absw, target) if absw.size > BISECT_SIZE
           else jnp.quantile(absw, target))
    return jnp.where(target > 0.0, thr, 0.0)


def apply_threshold(w: jax.Array, threshold: jax.Array) -> jax.Array:
    """Zero entries with |w| < threshold (reference ``:660-661`` mask+zero)."""
    return jnp.where(jnp.abs(w) < threshold, jnp.zeros_like(w), w)


@partial(jax.jit, static_argnames=("prune_fm", "prune_deep", "prune_r",
                                   "dense_rows", "structured_deep"))
def prune_params(params: Dict, adaptive_sparse: jax.Array, *,
                 emb_r: float = 1.0, emb_corr: float = 1.0,
                 prune_fm: bool = True, prune_deep: bool = True,
                 prune_r: bool = False, dense_rows: int = 0,
                 structured_deep: bool = False) -> Dict:
    """One prune refresh over the parameter pytree. Returns pruned params.

    ``dense_rows``: true row count of the packed ``dense`` table. When the
    table was padded to a mesh-divisible row count (``parallel.mesh.
    pad_rows_for_mesh``), the threshold quantile is computed over the real rows
    only so the all-zero padding rows can't skew the schedule.

    ``structured_deep``: TPU extension (CLI ``-prune_deep_structured``) —
    prune whole hidden UNITS by weight-column L2 norm on the same adaptive
    schedule, instead of scattered elements. Scattered zeros are worthless to
    the MXU (a dense systolic array); unit pruning lets
    :mod:`..serving.compaction` shrink the tower into a smaller DENSE tower
    that serves proportionally faster — the TPU counterpart of the
    reference's CSR sparse serving (``latency/criteo_latency.cpp:144-170``).
    The unit's bias is zeroed with its column so the unit is fully dead."""
    params = dict(params)

    if prune_fm and "emb2" in params:
        tables = params["emb2"]

        def real(k, t):
            if k == "dense" and dense_rows and t.shape[0] > dense_rows:
                return t[:dense_rows]
            return t

        flats = []
        for k, t in tables.items():
            if isinstance(t, dict):
                # super-row packed layout (ops/superpack.py): threshold over
                # the packed values directly; the ≤(pack_factor−1)·E zero
                # padding values of the last super-row — plus, on mesh-super
                # runs, the ≤(shards−1) all-zero super-rows pad_rows_for_mesh
                # appends — are a ≤1e-5 fraction of a web-scale table and
                # cannot move the bisection
                flats.append(t["packed"].ravel())
            else:
                flats.append(real(k, t).ravel())
        flat = jnp.concatenate(flats)
        thr = magnitude_threshold(flat, adaptive_sparse * emb_r)
        params["emb2"] = jax.tree.map(lambda t: apply_threshold(t, thr), tables)

    if prune_deep:
        if "deep" in params:
            new_deep = {}
            for net_name, net in params["deep"].items():
                layers = []
                for layer in net["layers"]:
                    if structured_deep:
                        w, b = layer["w"], layer["b"]
                        norms = jnp.sqrt(jnp.sum(w * w, axis=0))   # per-unit
                        thr = magnitude_threshold(norms, adaptive_sparse)
                        dead = norms < thr
                        layers.append({
                            "w": jnp.where(dead[None, :], jnp.zeros_like(w), w),
                            "b": jnp.where(dead, jnp.zeros_like(b), b)})
                    else:
                        thr = magnitude_threshold(layer["w"], adaptive_sparse)
                        layers.append({"w": apply_threshold(layer["w"], thr),
                                       "b": layer["b"]})
                new_deep[net_name] = {"layers": layers, "fc_w": net["fc_w"]}
            params["deep"] = new_deep
        if "fwlw_w" in params:
            # the reference's 'linear in name' filter also prunes fwfm_linear
            thr = magnitude_threshold(params["fwlw_w"], adaptive_sparse)
            params["fwlw_w"] = apply_threshold(params["fwlw_w"], thr)

    if prune_r and "field_cov" in params:
        r = params["field_cov"]
        sym = 0.5 * (r + r.T)
        thr = magnitude_threshold(sym, adaptive_sparse * emb_corr)
        params["field_cov"] = jnp.where(jnp.abs(sym) < thr, jnp.zeros_like(r), r)

    return params


def make_masks(params: Dict, cfg: ModelConfig) -> Dict:
    """0/1 masks of the current sparsity pattern (for serving-time sparse
    kernels and checkpoint metadata; training itself follows the reference's
    zero-in-place behavior)."""
    return jax.tree.map(lambda p: (p != 0).astype(p.dtype), params)


def sparsity_report(params: Dict) -> Dict[str, float]:
    total = 0
    nonzero = 0
    for leaf in jax.tree.leaves(params):
        total += leaf.size
        nonzero += int(jnp.sum(leaf != 0))
    return {"total": total, "nonzero": nonzero,
            "sparsity_pct": 100.0 * (1.0 - nonzero / max(total, 1))}
