"""Post-training quantization drivers: dynamic / static / QAT conversion.

TPU-native counterpart of the reference's three torch.quantization modes
(``quantization.py``):

* **dynamic** (``:48-64``): int8 weights for the deep tower's Linear layers
  only, activation scales computed per batch at runtime;
* **static PTQ** (``:72-114``): a calibration pass (5 × 2048 train rows, as the
  reference) records per-layer activation abs-max → fixed activation scales;
  embeddings become weight-only int8 with per-row scales;
* **QAT** (``:118-147``): training runs with fake-quant (STE) around the deep
  tower — see ``ModelConfig.quantization_aware`` — and converts to the same
  int8 serving model on eval.

Exactly like the reference, the FM/FwFM einsum interactions stay float32 — the
reference dequantizes there because einsum is not quantizable
(``model/DeepFMs.py:341-344,358-359``); here the table dequant happens on
gather so interactions always see f32 vectors.

The quantized model is served by :func:`quantized_forward` — a separate jitted
function mirroring :func:`..models.deepfwfm.forward` with the deep tower on the
int8 MXU path.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..models import deepfwfm
from ..ops import embedding as emb_ops
from ..ops import interactions as inter_ops
from ..ops import quantized as q_ops


@dataclass
class QuantizedModel:
    """Converted int8 model: fp32 shallow params + int8 tables/MLP.

    Registered as a JAX pytree (cfg/mode static) so it can be passed as a
    jitted-function ARGUMENT — closing over multi-megabyte arrays bakes them
    into the executable as constants, which costs minutes of compile and an
    ~80× slower dispatch path (measured; see RESULTS.md).
    """
    cfg: ModelConfig
    mode: str                       # dynamic | static | qat
    params_fp: Dict                 # bias / lw / fwlw / field_cov (fp32)
    emb1_q: Optional[Dict]          # weight-only int8 tables {name: {q, scale}}
    emb2_q: Optional[Dict]
    deep_q: Optional[Dict]          # {net_i: {layers: [{w_q, w_scale, b}], fc: ...}}
    act_scales: Optional[Dict]      # static mode: per-layer activation scales
    ffm1_q: Optional[Dict] = None   # FFM int8 tables (DeepFFM family)
    ffm2_q: Optional[Dict] = None

    def size_bytes(self) -> int:
        total = 0
        for tree in (self.params_fp, self.emb1_q, self.emb2_q, self.deep_q,
                     self.act_scales, self.ffm1_q, self.ffm2_q):
            if tree is not None:
                total += sum(np.asarray(x).nbytes for x in jax.tree.leaves(tree))
        return total


jax.tree_util.register_pytree_node(
    QuantizedModel,
    lambda m: ((m.params_fp, m.emb1_q, m.emb2_q, m.deep_q, m.act_scales,
                m.ffm1_q, m.ffm2_q),
               (m.cfg, m.mode)),
    lambda aux, kids: QuantizedModel(cfg=aux[0], mode=aux[1], params_fp=kids[0],
                                     emb1_q=kids[1], emb2_q=kids[2],
                                     deep_q=kids[3], act_scales=kids[4],
                                     ffm1_q=kids[5], ffm2_q=kids[6]),
)


def _quantize_tables(tables: Optional[Dict]) -> Optional[Dict]:
    if tables is None:
        return None
    return {k: q_ops.quantize_embedding_rows(t) for k, t in tables.items()}


def _quantize_deep(deep: Dict) -> Dict:
    out = {}
    for net_name, net in deep.items():
        layers = []
        for layer in net["layers"]:
            w_q, w_scale = q_ops.quantize_symmetric(layer["w"], axis=1)  # per-out-channel
            layers.append({"w_q": w_q, "w_scale": w_scale.reshape(-1), "b": layer["b"]})
        fc_q, fc_scale = q_ops.quantize_symmetric(net["fc_w"], axis=1)
        out[net_name] = {"layers": layers, "fc": {"w_q": fc_q, "w_scale": fc_scale.reshape(-1)}}
    return out


def convert(params: Dict, cfg: ModelConfig, mode: str = "dynamic",
            act_scales: Optional[Dict] = None,
            quantize_embeddings: bool = True) -> QuantizedModel:
    """params (fp32 pytree) → :class:`QuantizedModel`. Covers every family the
    fp32 forward covers, including DeepFFM (``ffm1``/``ffm2`` become
    weight-only int8 tables like ``emb1``/``emb2``)."""
    params_fp = {k: v for k, v in params.items()
                 if k in ("bias", "lw_w", "fwlw_w", "field_cov")}
    emb1_q = _quantize_tables(params.get("emb1")) if quantize_embeddings else None
    emb2_q = _quantize_tables(params.get("emb2")) if quantize_embeddings else None
    ffm1_q = _quantize_tables(params.get("ffm1")) if quantize_embeddings else None
    ffm2_q = _quantize_tables(params.get("ffm2")) if quantize_embeddings else None
    if not quantize_embeddings:
        for k in ("emb1", "emb2", "ffm1", "ffm2"):
            if k in params:
                params_fp[k] = params[k]
    deep_q = _quantize_deep(params["deep"]) if "deep" in params else None
    return QuantizedModel(cfg=cfg, mode=mode, params_fp=params_fp,
                          emb1_q=emb1_q, emb2_q=emb2_q, deep_q=deep_q,
                          act_scales=act_scales, ffm1_q=ffm1_q, ffm2_q=ffm2_q)


def calibrate(params: Dict, cfg: ModelConfig, xi: np.ndarray, xv: np.ndarray,
              n_batches: int = 5, batch_size: int = 2048) -> Dict:
    """Static-PTQ calibration: run ``n_batches × batch_size`` rows (reference
    ``quantization.py:92-103``) and record per-layer activation abs-max —
    for EVERY deep net when ``num_deeps > 1`` (each net has its own weights,
    so its own activation ranges)."""
    spec = deepfwfm.make_embedding_spec(cfg)
    n_layers = cfg.h_depth
    net_names = [f"net_{i}" for i in range(1, cfg.num_deeps + 1)]

    @jax.jit
    def layer_maxes(xi_b, xv_b):
        b = xi_b.shape[0]
        if cfg.use_ffm:
            f, e = cfg.field_size, cfg.embedding_size
            pair = emb_ops.packed_lookup(params["ffm2"], spec, xi_b, xv_b)
            x0 = jnp.sum(pair.reshape(b, f, f, e), axis=2).reshape(b, -1)
        else:
            emb2 = emb_ops.packed_lookup(params["emb2"], spec, xi_b, xv_b)
            x0 = emb2.reshape(b, -1)
        maxes = [jnp.max(jnp.abs(x0))]
        for name in net_names:
            x = x0
            for layer in params["deep"][name]["layers"]:
                x = jax.nn.relu(x @ layer["w"] + layer["b"])
                maxes.append(jnp.max(jnp.abs(x)))
        return jnp.stack(maxes)

    amax = np.zeros(1 + len(net_names) * n_layers)
    n = xi.shape[0]
    for i in range(n_batches):
        lo = (i * batch_size) % max(n - batch_size, 1)
        sl = slice(lo, lo + batch_size)
        m = np.asarray(layer_maxes(jnp.asarray(xi[sl]), jnp.asarray(xv[sl])))
        amax = np.maximum(amax, m)
    scales = np.maximum(amax, 1e-12) / 127.0
    nets = {name: [jnp.float32(s)
                   for s in scales[1 + j * n_layers: 1 + (j + 1) * n_layers]]
            for j, name in enumerate(net_names)}
    return {"input": jnp.float32(scales[0]), "nets": nets}


def group_quantized_tables(qm: QuantizedModel) -> QuantizedModel:
    """Predictor-side transform to the GROUPED serving layout (round 5): each
    dense int8 table splits into contiguous field-row groups under the gather
    knee (~1 MB per lane column; ``ops.embedding.serving_field_groups``) —
    measured 3.2× on the full-Criteo int8 lookup
    (``scripts/measure_grouped_gather.py``). No-op for QR/FFM configs."""
    from dataclasses import replace
    spec = deepfwfm.make_embedding_spec(qm.cfg)
    if spec.has_qr or qm.cfg.use_ffm:
        return qm

    def split(tq):
        if tq is None or "dense" not in tq or "qs" not in tq["dense"]:
            return tq
        qs = tq["dense"]["qs"]
        groups = emb_ops.serving_field_groups(spec, 1)
        new = dict(tq)
        new["dense"] = {"qs_num": qs[:spec.numerical],
                        "qs_groups": tuple(qs[rlo:rhi]
                                           for _, _, rlo, rhi in groups)}
        return new

    return replace(qm, emb1_q=split(qm.emb1_q), emb2_q=split(qm.emb2_q))


def quantized_forward(qm: QuantizedModel, xi: jax.Array, xv: jax.Array,
                      use_fused_kernel: bool = False) -> jax.Array:
    """Serving forward on the int8 path. Mirrors
    :func:`..models.deepfwfm.forward` (eval mode) with:

    * embedding gather with per-row dequant (weight-only int8),
    * deep tower as int8 MXU matmuls (dynamic or calibrated activation scales),
    * interactions/linear terms fp32 (reference dequantizes for einsum).

    ``use_fused_kernel``: run the deep tower as ONE fused Pallas kernel
    (``ops/pallas/int8_mlp``) — activations never leave VMEM between layers.
    Requires batch divisible by the kernel tile (512) and dynamic activation
    scales (per-tile); falls back automatically otherwise.
    """
    cfg = qm.cfg
    spec = deepfwfm.make_embedding_spec(cfg)
    b = xi.shape[0]
    def lookup(tables_q, tables_fp, dim):
        if tables_q is None:
            return emb_ops.packed_lookup_serving(tables_fp, spec, xi, xv)
        # serving-form gather (see ops.embedding.packed_lookup_serving):
        # numeric rows are STATIC slices, categorical fields ONE clipped
        # gather — the int8 path gathers two arrays (values + per-row
        # scales), so avoiding the 39-field raw gather matters double.
        num = spec.numerical
        assert all(n == 1 for n in spec.feature_sizes[:num])
        dq = tables_q["dense"]
        if "qs_groups" in dq:
            # grouped layout (group_quantized_tables): G sub-knee gathers —
            # 1.077 → 0.340 ms on the full-Criteo lookup (RESULTS.md round 5)
            groups = emb_ops.serving_field_groups(spec, 1)
            parts = []
            if num:
                rows, sc = q_ops.unpack_qs(dq["qs_num"])
                parts.append((rows * sc)[None] * xv[..., None])
            xi_c = emb_ops._clip_per_field(xi, spec.feature_sizes[num:])
            outs = []
            for (flo, fhi, rlo, rhi), sub in zip(groups, dq["qs_groups"]):
                offs = jnp.asarray(
                    [o - rlo for o in spec.dense_offsets[num + flo:num + fhi]],
                    xi.dtype)[None, :]
                idx = jnp.clip(xi_c[:, flo:fhi] + offs, 0, sub.shape[0] - 1)
                outs.append(q_ops.gather_dequant({"qs": sub}, idx))
            parts.append(jnp.concatenate(outs, axis=1))
            return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        parts = []
        if num:
            rows, sc = q_ops.unpack_qs(jax.lax.slice_in_dim(dq["qs"], 0, num, axis=0))
            parts.append((rows * sc)[None] * xv[..., None])
        cat_offs = jnp.asarray(spec.dense_offsets[num:], xi.dtype)[None, :]
        cidx = jnp.clip(xi + cat_offs, 0, dq["qs"].shape[0] - 1)
        emb = q_ops.gather_dequant(dq, cidx)
        if spec.has_qr:
            c = spec.qr_collisions
            qi = jnp.clip(jnp.asarray(spec.q_offsets[num:])[None, :] + xi // c,
                          0, tables_q["q"]["qs"].shape[0] - 1)
            ri = jnp.clip(jnp.asarray(spec.r_offsets[num:])[None, :] + xi % c,
                          0, tables_q["r"]["qs"].shape[0] - 1)
            eq = q_ops.gather_dequant(tables_q["q"], qi)
            er = q_ops.gather_dequant(tables_q["r"], ri)
            qr = {"mult": eq * er, "add": eq + er}.get(
                spec.qr_operation, jnp.concatenate([eq, er], -1))
            emb = jnp.where(jnp.asarray(spec.is_qr_field[num:])[None, :, None],
                            qr, emb)
        parts.append(emb)
        return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]

    first_order = None
    second_order = None
    emb2 = None
    pair_emb = None
    if cfg.use_logit or cfg.use_fm or cfg.use_fwfm:
        if not cfg.use_fwlw:
            first_order = lookup(qm.emb1_q, qm.params_fp.get("emb1"), 1)[..., 0]
        if cfg.use_fm or cfg.use_fwfm:
            emb2 = lookup(qm.emb2_q, qm.params_fp.get("emb2"), cfg.embedding_size)
            if cfg.use_fwlw:
                first_order = inter_ops.fwfm_linear_term(emb2, qm.params_fp["fwlw_w"])
            second_order = (inter_ops.fm_second_order(emb2) if cfg.use_fm
                            else inter_ops.fwfm_second_order(emb2, qm.params_fp["field_cov"]))

    if cfg.use_ffm:
        # DeepFFM family: int8 field-pair tables, fp32 interactions
        # (mirrors the fp32 forward, models/deepfwfm.py:145-153)
        f, e = cfg.field_size, cfg.embedding_size
        first_order = lookup(qm.ffm1_q, qm.params_fp.get("ffm1"), 1)[..., 0]
        pair_emb = lookup(qm.ffm2_q, qm.params_fp.get("ffm2"), f * e).reshape(b, f, f, e)
        second_order = inter_ops.ffm_second_order(pair_emb)

    x_deep = None
    if cfg.use_deep:
        if cfg.use_ffm:
            x = jnp.sum(pair_emb, axis=2).reshape(b, -1)
        else:
            if emb2 is None:
                emb2 = lookup(qm.emb2_q, qm.params_fp.get("emb2"), cfg.embedding_size)
            x = emb2.reshape(b, -1)
        act = qm.act_scales
        fused_ok = (use_fused_kernel and act is None and cfg.num_deeps == 1
                    and b % 512 == 0)
        if use_fused_kernel and not fused_ok and b >= 512:
            # trace-time (once per compiled shape), so the jitted path is
            # clean. b < 512 is the by-design single/small-batch serving path
            # (the kernel tiles at 512 rows) — warning there would train
            # users to ignore it.
            import logging
            logging.getLogger("xsdeepfwfm_tpu").warning(
                "fused int8 tower requested but falling back to the layerwise "
                "path: batch %d %% 512 = %d, act_scales %s, num_deeps %d "
                "(fused needs batch%%512==0, dynamic scales, one net)",
                b, b % 512, "static" if act is not None else "dynamic",
                cfg.num_deeps)
        if fused_ok:
            from ..ops.pallas.int8_mlp import int8_mlp_pallas, pack_quantized_deep
            layers_q, fc_q = pack_quantized_deep(qm.deep_q)
            x_deep = int8_mlp_pallas(x, layers_q, fc_q, block_b=512)
        for nidx in (() if fused_ok else range(1, cfg.num_deeps + 1)):
            net = qm.deep_q[f"net_{nidx}"]
            # per-net calibrated scales (each net has its own activation
            # ranges); "hidden" is the legacy single-net artifact layout
            a_hidden = (act["nets"][f"net_{nidx}"] if act is not None and "nets" in act
                        else act["hidden"] if act is not None else None)
            h = x
            for i, layer in enumerate(net["layers"]):
                a_scale = a_hidden[i - 1] if (act is not None and i > 0) else \
                          (act["input"] if act is not None else None)
                h = q_ops.quantized_dense(h, layer["w_q"], layer["w_scale"],
                                          layer["b"], a_scale)
                h = jax.nn.relu(h)
            a_scale = a_hidden[-1] if act is not None else None
            out = q_ops.quantized_dense(h, net["fc"]["w_q"], net["fc"]["w_scale"],
                                        None, a_scale)
            x_deep = out

    bias = qm.params_fp["bias"][0] if "bias" in qm.params_fp else jnp.float32(0.01)
    if (cfg.use_fm or cfg.use_fwfm) and cfg.use_lw:
        first_order = jnp.dot(first_order, qm.params_fp["lw_w"],
                              preferred_element_type=jnp.float32)
    if cfg.use_logit:
        return jnp.sum(first_order, axis=1) + bias
    if (cfg.use_fm or cfg.use_fwfm or cfg.use_ffm) and cfg.use_deep:
        return (jnp.sum(first_order, axis=1) + jnp.sum(second_order, axis=1)
                + jnp.sum(x_deep, axis=1) + bias)
    if cfg.use_fm or cfg.use_fwfm or cfg.use_ffm:
        return jnp.sum(first_order, axis=1) + jnp.sum(second_order, axis=1) + bias
    return jnp.sum(x_deep, axis=1) + bias
