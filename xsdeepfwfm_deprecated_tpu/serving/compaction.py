"""Serve-time compaction of pruned models: the TPU counterpart of CSR serving.

The reference's famous sparse-serving result (46×/27× single-example speedup,
``/root/reference/latency/criteo_latency.cpp:144-170``, paper Table 5) comes
from CSR matrix-vector products on CPU — a representation that exploits
UNSTRUCTURED sparsity. A TPU's MXU is a dense systolic array: scattered zeros
buy nothing, so the TPU-native way to make DeepLight pruning pay at serve
time is STRUCTURAL compaction, done once offline:

1. **Embedding row compaction** — rows of the packed tables that pruning
   zeroed entirely are dropped; a single int32 remap array sends every
   original row id either to its surviving compact row or to a shared
   all-zero row 0. Lookup becomes remap-gather → row-gather, numerically
   identical to gathering the zero row. Shrinks the dominant HBM resident
   (53 MB emb2 at full-Criteo) by the zero-ROW fraction for +4 B/lookup of
   remap traffic.
2. **Deep-tower unit compaction** — hidden units whose incoming weights are
   all zero compute ``relu(b_j)``, a CONSTANT: that constant is folded into
   the next layer's bias (or the new fc bias) and the unit is dropped — its
   weight column, bias entry, and next-layer row disappear. Dead input
   dimensions of layer 0 are dropped via a static column gather. The result
   is a strictly smaller DENSE tower with bitwise-equal semantics, which the
   MXU executes proportionally faster. Unstructured D-90 leaves ~no dead
   units (P[column of 400 iid weights all zero] ≈ 0.9⁴⁰⁰); the structured
   pruning mode (:func:`..compression.pruning.prune_params` with
   ``structured_deep=True``, CLI ``-prune_deep_structured``, a documented TPU
   extension) prunes whole units by column L2 norm on the same DeepLight
   schedule, so a D-90 recipe compacts the 400³ tower to ~40³.
3. **Optional int8** — compact tables get per-row int8 scales
   (dequant-on-gather) and compact tower layers per-channel int8 MXU matmuls,
   composing with :mod:`..compression.quantization`'s serving path.

``compact_for_serving`` builds a :class:`CompactModel`;
:func:`compact_forward` is its jittable eval forward, logit-equal to
``deepfwfm.forward`` on the pruned params (asserted in
``tests/test_compaction.py``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..models import deepfwfm
from ..ops import embedding as emb_ops
from ..ops import interactions as inter_ops
from ..ops import quantized as q_ops


@dataclass
class CompactModel:
    """Pruned model compacted for serving. Registered as a pytree (cfg and the
    static layer-0 input gather are aux data) so it is passed as a jitted
    ARGUMENT, never a closure (see Predictor docstring)."""

    cfg: ModelConfig
    int8: bool
    keep_in0: Tuple[int, ...]           # static layer-0 input dims kept
    params_fp: Dict                     # bias / lw_w / fwlw_w / field_cov
    emb1: Optional[Dict]                # {remap, table | q+scale} per table set
    emb2: Optional[Dict]
    deep: Optional[Dict]                # {layers: [{w|w_q.., b}], fc_w|fc_q.., fc_b}

    def size_bytes(self) -> int:
        return int(sum(np.asarray(x).nbytes for x in jax.tree.leaves(
            (self.params_fp, self.emb1, self.emb2, self.deep))))


jax.tree_util.register_pytree_node(
    CompactModel,
    lambda m: ((m.params_fp, m.emb1, m.emb2, m.deep),
               (m.cfg, m.int8, m.keep_in0)),
    lambda aux, kids: CompactModel(cfg=aux[0], int8=aux[1], keep_in0=aux[2],
                                   params_fp=kids[0], emb1=kids[1],
                                   emb2=kids[2], deep=kids[3]),
)


def _compact_tables(tables: Dict, int8: bool, compact_rows: bool = True) -> Dict:
    """Drop all-zero rows of the packed dense table behind an int32 remap.

    Compact row 0 is an explicit zero row every pruned original row maps to,
    so the two-step gather reproduces the original lookup exactly. QR q/r
    tables are small and kept whole (int8-quantized when asked).

    ``compact_rows=False`` keeps the table full-size with NO remap (the
    lookup stays a single gather): on a TPU the remap indirection costs a
    second full-price gather per lookup (~2× lookup latency, measured round
    3), so row compaction is a CAPACITY tool — take it when HBM footprint
    binds, skip it when latency does."""
    dense = np.asarray(tables["dense"])
    if compact_rows:
        alive = np.any(dense != 0, axis=1)
        remap = np.zeros(dense.shape[0], np.int32)
        remap[alive] = 1 + np.arange(int(alive.sum()), dtype=np.int32)
        compact = np.concatenate(
            [np.zeros((1, dense.shape[1]), dense.dtype), dense[alive]], axis=0)
        out = {"remap": jnp.asarray(remap)}
    else:
        compact = dense
        out = {}
    if int8:
        out["dense_q"] = q_ops.quantize_embedding_rows(jnp.asarray(compact))
    else:
        out["dense"] = jnp.asarray(compact)
    for k in ("q", "r"):
        if k in tables:
            out[k + "_q" if int8 else k] = (
                q_ops.quantize_embedding_rows(tables[k]) if int8 else tables[k])
    return out


def _compact_tower(net: Dict) -> Tuple[List[Dict], jax.Array, jax.Array, np.ndarray]:
    """Exact unit compaction of one deep net (layers + fc head).

    Returns (compact layers, fc_w, fc_b, kept layer-0 input dims). A unit j
    with an all-zero weight column outputs the constant ``relu(b_j)``; its
    contribution ``relu(b_j)·W_next[j]`` folds into the next bias (or fc_b),
    then column j, b_j and row j of W_next are dropped."""
    ws = [np.asarray(l["w"]) for l in net["layers"]]   # (in, out) each
    bs = [np.asarray(l["b"]).copy() for l in net["layers"]]
    fc_w = np.asarray(net["fc_w"]).copy()               # (out_L, 1)
    fc_b = np.zeros((1,), fc_w.dtype)

    # dead layer-0 input dims (all-zero weight ROWS): gather them away
    keep_in = np.flatnonzero(np.any(ws[0] != 0, axis=1))
    if keep_in.size == 0:
        keep_in = np.asarray([0])
    ws[0] = ws[0][keep_in]

    for l in range(len(ws)):
        dead = ~np.any(ws[l] != 0, axis=0)              # units with zero column
        if not dead.any():
            continue
        const = np.maximum(bs[l][dead], 0.0)            # relu(b_j) constants
        if l + 1 < len(ws):
            bs[l + 1] = bs[l + 1] + const @ ws[l + 1][dead]
            ws[l + 1] = np.ascontiguousarray(ws[l + 1][~dead])
        else:
            fc_b = fc_b + const @ fc_w[dead]
            fc_w = np.ascontiguousarray(fc_w[~dead])
        ws[l] = np.ascontiguousarray(ws[l][:, ~dead])
        bs[l] = np.ascontiguousarray(bs[l][~dead])

    layers = [{"w": jnp.asarray(w), "b": jnp.asarray(b)} for w, b in zip(ws, bs)]
    return layers, jnp.asarray(fc_w), jnp.asarray(fc_b), keep_in


def compact_for_serving(params: Dict, cfg: ModelConfig,
                        int8: bool = False,
                        compact_rows: bool = True) -> CompactModel:
    """Pruned fp32 params → :class:`CompactModel` (optionally int8).

    ``compact_rows=False`` keeps embedding tables full-size (no remap
    indirection): the tower still compacts, the lookup stays one gather —
    the latency-optimal form of structured-pruned serving on TPU."""
    if cfg.use_ffm:
        raise NotImplementedError(
            "compaction covers the DeepLight families (LR/FM/FwFM/DeepFwFM); "
            "FFM's (Σn_i, F·E) tables are memory-prohibitive at the scales "
            "where compaction matters (see models/deepfwfm.py ffm note)")
    params_fp = {k: v for k, v in params.items()
                 if k in ("bias", "lw_w", "fwlw_w", "field_cov")}
    emb1 = _compact_tables(params["emb1"], int8, compact_rows) if "emb1" in params else None
    emb2 = _compact_tables(params["emb2"], int8, compact_rows) if "emb2" in params else None

    deep = None
    keep_in0: Tuple[int, ...] = ()
    if "deep" in params:
        # reference semantics: only the LAST net contributes (DeepFMs.py:430-433)
        net = params["deep"][f"net_{cfg.num_deeps}"]
        layers, fc_w, fc_b, keep_in = _compact_tower(net)
        keep_in0 = tuple(int(i) for i in keep_in)
        if int8:
            q_layers = []
            for l in layers:
                w_q, w_s = q_ops.quantize_symmetric(l["w"], axis=1)
                q_layers.append({"w_q": w_q, "w_scale": w_s.reshape(-1), "b": l["b"]})
            fc_q, fc_s = q_ops.quantize_symmetric(fc_w, axis=1)
            deep = {"layers": q_layers,
                    "fc": {"w_q": fc_q, "w_scale": fc_s.reshape(-1)}, "fc_b": fc_b}
        else:
            deep = {"layers": layers, "fc_w": fc_w, "fc_b": fc_b}

    return CompactModel(cfg=cfg, int8=int8, keep_in0=keep_in0,
                        params_fp=params_fp, emb1=emb1, emb2=emb2, deep=deep)


def _lookup(tables: Dict, spec, xi: jax.Array, xv: jax.Array,
            int8: bool) -> jax.Array:
    """Serving-form compacted lookup: static numeric rows (remapped at trace
    time, a 13-row constant gather), then ONE cat-field remap-gather → ONE
    row-gather (→ dequant) → QR merge. The remap indirection is the price of
    dropping all-zero rows from HBM; keeping it off the 13 numeric fields and
    the per-row scales inline keeps it to exactly 2 full-price gathers."""
    num = spec.numerical
    assert all(n == 1 for n in spec.feature_sizes[:num])
    remap = tables.get("remap")   # None = rows kept full-size, direct gather
    n_rows = (tables["dense_q"]["qs"] if int8 else tables["dense"]).shape[0]
    parts = []
    if num:
        nidx = jnp.asarray(spec.dense_offsets[:num], jnp.int32)
        if remap is not None:
            nidx = jnp.take(remap, nidx, axis=0)
        if int8:
            nv, ns = q_ops.unpack_qs(jnp.take(tables["dense_q"]["qs"], nidx, axis=0))
            nrow = nv * ns
        else:
            nrow = jnp.take(tables["dense"], nidx, axis=0)
        parts.append(xv[..., None] * nrow[None])
    cat_offs = jnp.asarray(spec.dense_offsets[num:], xi.dtype)[None, :]
    if remap is not None:
        gidx = jnp.take(remap, jnp.clip(xi + cat_offs, 0, remap.shape[0] - 1),
                        axis=0)
    else:
        gidx = jnp.clip(xi + cat_offs, 0, n_rows - 1)
    if int8:
        emb = q_ops.gather_dequant(tables["dense_q"], gidx)
    else:
        emb = jnp.take(tables["dense"], gidx, axis=0)
    if spec.has_qr:
        c = spec.qr_collisions
        if int8:
            qi = jnp.clip(jnp.asarray(spec.q_offsets[num:])[None, :] + xi // c,
                          0, tables["q_q"]["qs"].shape[0] - 1)
            ri = jnp.clip(jnp.asarray(spec.r_offsets[num:])[None, :] + xi % c,
                          0, tables["r_q"]["qs"].shape[0] - 1)
            eq = q_ops.gather_dequant(tables["q_q"], qi)
            er = q_ops.gather_dequant(tables["r_q"], ri)
        else:
            qi = jnp.clip(jnp.asarray(spec.q_offsets[num:])[None, :] + xi // c,
                          0, tables["q"].shape[0] - 1)
            ri = jnp.clip(jnp.asarray(spec.r_offsets[num:])[None, :] + xi % c,
                          0, tables["r"].shape[0] - 1)
            eq = jnp.take(tables["q"], qi, axis=0)
            er = jnp.take(tables["r"], ri, axis=0)
        qr = {"mult": eq * er, "add": eq + er}.get(
            spec.qr_operation, jnp.concatenate([eq, er], -1))
        emb = jnp.where(jnp.asarray(spec.is_qr_field[num:])[None, :, None],
                        qr, emb)
    parts.append(emb)
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]


def compact_forward(cm: CompactModel, xi: jax.Array, xv: jax.Array) -> jax.Array:
    """Eval forward over a CompactModel; logit-equal to
    :func:`..models.deepfwfm.forward` on the pruned params."""
    cfg = cm.cfg
    spec = deepfwfm.make_embedding_spec(cfg)
    b = xi.shape[0]

    first_order = None
    second_order = None
    emb2 = None
    if cfg.use_logit or cfg.use_fm or cfg.use_fwfm:
        if not cfg.use_fwlw:
            first_order = _lookup(cm.emb1, spec, xi, xv, cm.int8)[..., 0]
        if cfg.use_fm or cfg.use_fwfm:
            emb2 = _lookup(cm.emb2, spec, xi, xv, cm.int8)
            if cfg.use_fwlw:
                first_order = inter_ops.fwfm_linear_term(emb2, cm.params_fp["fwlw_w"])
            second_order = (inter_ops.fm_second_order(emb2) if cfg.use_fm
                            else inter_ops.fwfm_second_order(emb2, cm.params_fp["field_cov"]))

    x_deep = None
    if cfg.use_deep:
        if emb2 is None:
            emb2 = _lookup(cm.emb2, spec, xi, xv, cm.int8)
        x = emb2.reshape(b, -1)
        if len(cm.keep_in0) < x.shape[1]:
            x = jnp.take(x, jnp.asarray(cm.keep_in0, jnp.int32), axis=1)
        if cm.int8:
            h = x
            for layer in cm.deep["layers"]:
                h = jax.nn.relu(q_ops.quantized_dense(
                    h, layer["w_q"], layer["w_scale"], layer["b"]))
            x_deep = q_ops.quantized_dense(
                h, cm.deep["fc"]["w_q"], cm.deep["fc"]["w_scale"], None
            ) + cm.deep["fc_b"]
        else:
            h = x
            for layer in cm.deep["layers"]:
                h = jax.nn.relu(h @ layer["w"] + layer["b"])
            x_deep = h @ cm.deep["fc_w"] + cm.deep["fc_b"]

    if (cfg.use_fm or cfg.use_fwfm) and cfg.use_lw:
        first_order = jnp.dot(first_order, cm.params_fp["lw_w"],
                              preferred_element_type=jnp.float32)
    bias = cm.params_fp["bias"][0] if "bias" in cm.params_fp else jnp.float32(0.01)
    if cfg.use_logit:
        return jnp.sum(first_order, axis=1) + bias
    if (cfg.use_fm or cfg.use_fwfm) and cfg.use_deep:
        return (jnp.sum(first_order, axis=1) + jnp.sum(second_order, axis=1)
                + jnp.sum(x_deep, axis=1) + bias)
    if cfg.use_fm or cfg.use_fwfm:
        return jnp.sum(first_order, axis=1) + jnp.sum(second_order, axis=1) + bias
    return jnp.sum(x_deep, axis=1) + bias


def compaction_report(params: Dict, cm: CompactModel, cfg: ModelConfig) -> Dict:
    """What compaction bought: row/unit survival and byte footprints."""
    out: Dict[str, float] = {"int8": cm.int8}
    if "emb2" in params and cm.emb2 is not None:
        dense = np.asarray(params["emb2"]["dense"])
        key = "dense_q" if cm.int8 else "dense"
        kept = (cm.emb2[key]["qs"].shape[0] if cm.int8
                else cm.emb2[key].shape[0]) - ("remap" in cm.emb2)
        out["emb2_rows"] = dense.shape[0]
        out["emb2_rows_kept"] = kept
        out["emb2_zero_row_pct"] = 100.0 * (1 - kept / max(dense.shape[0], 1))
    if "deep" in params and cm.deep is not None:
        net = params["deep"][f"net_{cfg.num_deeps}"]
        orig = [np.asarray(l["w"]).shape for l in net["layers"]]
        comp = [(np.asarray(l.get("w", l.get("w_q"))).shape)
                for l in cm.deep["layers"]]
        out["tower_shapes_orig"] = orig
        out["tower_shapes_compact"] = comp
        orig_macs = sum(int(np.prod(s)) for s in orig)
        comp_macs = sum(int(np.prod(s)) for s in comp)
        out["tower_mac_reduction"] = orig_macs / max(comp_macs, 1)
    fp_bytes = int(sum(np.asarray(x).nbytes for x in jax.tree.leaves(params)))
    out["bytes_full"] = fp_bytes
    out["bytes_compact"] = cm.size_bytes()
    return out
