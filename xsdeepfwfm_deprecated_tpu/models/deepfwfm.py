"""Unified FM-family model as pure JAX functions.

TPU-native re-design of the reference's single ``DeepFMs`` nn.Module
(``model/DeepFMs.py:47-469``), covering every capability flag combination:
LR / FM / FFM / FwFM / DeepFM / DeepFFM / DeepFwFM / deep-only, with
``use_lw`` / ``use_fwlw`` linear terms and QR embeddings.

Differences from the reference are architectural, not semantic:

* parameters are a pytree (dict) of packed arrays, not 39 nn.Embedding modules;
* the forward is a pure function ``forward(params, xi, xv, cfg, ...)`` traced
  once under ``jax.jit``;
* interactions use contraction identities (:mod:`..ops.interactions`) instead
  of materializing the (F, F, B, E) outer product.

Documented reference bugs NOT replicated:
* deep-only mode crashes in the reference (no ``self.bias`` registered at
  ``:186`` yet used at ``:467``; numeric scaling at ``:402`` indexes past Xv).
  Here deep-only works: packed lookup + bias.
* ``num_deeps > 1`` computes all nets but uses only the last
  (``:430-433``) — semantics preserved (only the last contributes).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..ops import embedding as emb_ops
from ..ops import interactions as inter_ops
from ..ops import mlp as mlp_ops
from ..ops.embedding import PackedEmbeddingSpec


def make_embedding_spec(cfg: ModelConfig) -> PackedEmbeddingSpec:
    return emb_ops.make_spec(
        cfg.feature_sizes, cfg.numerical, qr_flag=cfg.qr_flag,
        qr_collisions=cfg.qr_collisions, qr_threshold=cfg.qr_threshold,
        qr_operation=cfg.qr_operation)


def _head_scale(cfg: ModelConfig) -> float:
    """sqrt(2/last_layer_size) for fm_1st / fc heads (reference
    ``init_weights``, ``model/DeepFMs.py:489-495``)."""
    last = 0
    if cfg.use_fm or cfg.use_fwfm:
        last += cfg.field_size + cfg.embedding_size
    if cfg.use_deep:
        last += cfg.deep_layers[-1] + 1
    return (2.0 / last) ** 0.5 if last > 0 else 1.0


def init_params(key: jax.Array, cfg: ModelConfig, dtype=jnp.float32) -> Dict:
    """Parameter pytree with the reference's init distributions
    (``model/DeepFMs.py:472-495``)."""
    spec = make_embedding_spec(cfg)
    keys = iter(jax.random.split(key, 16))
    params: Dict = {}
    f, e = cfg.field_size, cfg.embedding_size
    head = _head_scale(cfg)

    if cfg.use_shallow:
        params["bias"] = jnp.asarray([0.01], dtype)          # reference :186

    # table storage dtype (-table_dtype bf16 halves table+moment HBM bytes;
    # the lookup upcasts to f32 for the interaction/tower math)
    tdt = jnp.bfloat16 if cfg.table_dtype == "bf16" else dtype
    if cfg.needs_emb1:
        params["emb1"] = emb_ops.init_tables(next(keys), spec, 1, scale=1.0, dtype=tdt)
    if cfg.needs_emb2:
        params["emb2"] = emb_ops.init_tables(next(keys), spec, e, scale=0.01, dtype=tdt)

    if (cfg.use_fm or cfg.use_fwfm) and cfg.use_lw:
        # fm_1st = Linear(field_size, 1, bias=False); N(0,1)·head (reference :216,:494)
        params["lw_w"] = jax.random.normal(next(keys), (f, 1), dtype) * head
    if (cfg.use_fm or cfg.use_fwfm or cfg.use_ffm) and cfg.use_fwlw:
        # fwfm_linear = Linear(E, field_size, bias=False); glorot over (F+E)
        # ('linear' branch of init_weights, reference :483-485)
        params["fwlw_w"] = jax.random.normal(next(keys), (f, e), dtype) * (2.0 / (f + e)) ** 0.5
    if cfg.use_fwfm:
        params["field_cov"] = (jax.random.normal(next(keys), (f, f), dtype)
                               * (2.0 / f / 2.0) ** 0.5)     # reference :486-487

    if cfg.use_ffm:
        # FFM keeps F field-specialized vectors PER ROW — (Σn_i, F·E) packed,
        # F× the FwFM table. Identical asymptotics to the reference's
        # per-field-pair ModuleList grid (model/DeepFMs.py:235-237); FFM on
        # web-scale cardinalities is memory-prohibitive in both designs.
        params["ffm1"] = emb_ops.init_tables(next(keys), spec, 1, scale=1.0, dtype=tdt)
        params["ffm2"] = emb_ops.init_tables(next(keys), spec, f * e, scale=0.01, dtype=tdt)

    if cfg.use_deep:
        deep_in = f * e
        params["deep"] = {
            f"net_{nidx}": mlp_ops.init_mlp(next(keys), deep_in, cfg.deep_layers, head, dtype)
            for nidx in range(1, cfg.num_deeps + 1)}
    return params


def forward(params: Dict, xi: jax.Array, xv: jax.Array, cfg: ModelConfig, *,
            train: bool = False, rng: Optional[jax.Array] = None,
            lookup_fn=None) -> jax.Array:
    """(xi int32 (B, C), xv f32 (B, Nnum)) → logits (B,).

    Mirrors the reference forward term-for-term (``model/DeepFMs.py:285-469``);
    see module docstring for the op-level redesign. ``lookup_fn`` overrides the
    packed-table gather (e.g. the row-sharded all-to-all lookup in
    :mod:`..parallel.embedding_sharding`).
    """
    from ..utils import profiling as prof
    spec = make_embedding_spec(cfg)
    lookup = lookup_fn or emb_ops.packed_lookup
    b = xi.shape[0]
    rngs = (jax.random.split(rng, 4) if (train and rng is not None) else [None] * 4)

    first_order = None
    second_order = None
    emb2 = None

    if cfg.use_logit or cfg.use_fm or cfg.use_fwfm:
        # profiler span names match the reference (model/DeepFMs.py:294-395)
        if not cfg.use_fwlw:
            with jax.named_scope(prof.SCOPE_FM):
                first_order = lookup(params["emb1"], spec, xi, xv)[..., 0]  # (B, F)
            first_order = mlp_ops.dropout(rngs[0], first_order, cfg.dropout_shallow[0],
                                          train and cfg.is_shallow_dropout)
        if cfg.use_fm or cfg.use_fwfm:
            with jax.named_scope(prof.SCOPE_FM):
                emb2 = lookup(params["emb2"], spec, xi, xv)             # (B, F, E)
            if cfg.use_fwlw:
                with jax.named_scope(prof.SCOPE_FWLW):
                    first_order = inter_ops.fwfm_linear_term(emb2, params["fwlw_w"])   # (B, F)
                first_order = mlp_ops.dropout(rngs[0], first_order, cfg.dropout_shallow[0],
                                              train and cfg.is_shallow_dropout)
            if cfg.use_fm:
                with jax.named_scope(prof.SCOPE_OUTER_FM):
                    second_order = inter_ops.fm_second_order(emb2)
            else:
                with jax.named_scope(prof.SCOPE_OUTER_FWFM):
                    second_order = inter_ops.fwfm_second_order(emb2, params["field_cov"])
            second_order = mlp_ops.dropout(rngs[1], second_order, cfg.dropout_shallow[1],
                                           train and cfg.is_shallow_dropout)

    if cfg.use_ffm:
        first_order = lookup(params["ffm1"], spec, xi, xv)[..., 0]
        first_order = mlp_ops.dropout(rngs[0], first_order, cfg.dropout_shallow[0],
                                      train and cfg.is_shallow_dropout)
        f, e = cfg.field_size, cfg.embedding_size
        pair_emb = lookup(params["ffm2"], spec, xi, xv).reshape(b, f, f, e)
        second_order = inter_ops.ffm_second_order(pair_emb)
        second_order = mlp_ops.dropout(rngs[1], second_order, cfg.dropout_shallow[1],
                                       train and cfg.is_shallow_dropout)

    x_deep = None
    if cfg.use_deep:
        # deep input = concat of the 39 field embeddings (reference :398).
        # The non-QAT tower takes the (B, F, E) tensor directly and fuses the
        # flatten into its first-layer contraction (ops/mlp.py round-4: the
        # materialized flatten of a lane-padded (B, F, 10) tensor cost
        # ~0.4 ms/step); the QAT tower quantizes the flat activation vector,
        # so it keeps the explicit reshape.
        if cfg.use_fm or cfg.use_fwfm:
            deep3 = emb2
        elif cfg.use_ffm:
            deep3 = jnp.sum(pair_emb, axis=2)                   # Σ_j e_{i,j} (reference :400)
        else:
            emb2 = lookup(params["emb2"], spec, xi, xv)
            deep3 = emb2
        deep_in = deep3.reshape(b, -1) if cfg.quantization_aware else deep3
        rates = (cfg.dropout_deep,) * (cfg.h_depth + 1) if cfg.is_deep_dropout else (0.0,) * (cfg.h_depth + 1)
        deep_fn = (mlp_ops.qat_mlp_forward if cfg.quantization_aware
                   else mlp_ops.mlp_forward)
        with jax.named_scope(prof.SCOPE_DEEP):
            for nidx in range(1, cfg.num_deeps + 1):
                out = deep_fn(params["deep"][f"net_{nidx}"], deep_in,
                              dropout_rates=rates, train=train, rng=rngs[2])
                x_deep = out  # reference keeps only the last net (:430-433)

    # --- logit assembly (reference :445-467) -------------------------------
    if (cfg.use_fm or cfg.use_fwfm) and cfg.use_lw:
        first_order = jnp.dot(first_order, params["lw_w"],
                              preferred_element_type=jnp.float32)  # (B, 1)

    bias = params["bias"][0] if "bias" in params else jnp.float32(0.01)
    if cfg.use_logit:
        total = jnp.sum(first_order, axis=1) + bias
    elif (cfg.use_fm or cfg.use_fwfm) and cfg.use_deep:
        total = (jnp.sum(first_order, axis=1) + jnp.sum(second_order, axis=1)
                 + jnp.sum(x_deep, axis=1) + bias)
    elif cfg.use_ffm and cfg.use_deep:
        total = (jnp.sum(first_order, axis=1) + jnp.sum(second_order, axis=1)
                 + jnp.sum(x_deep, axis=1) + bias)
    elif cfg.use_fm or cfg.use_fwfm or cfg.use_ffm:
        total = jnp.sum(first_order, axis=1) + jnp.sum(second_order, axis=1) + bias
    else:
        total = jnp.sum(x_deep, axis=1) + bias
    return total


def param_count(params: Dict) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))


def nonzero_param_count(params: Dict) -> int:
    return int(sum(int(jnp.sum(p != 0)) for p in jax.tree.leaves(params)))


def param_group_counts(params: Dict, cfg: ModelConfig, nonzero: bool = False) -> Dict[str, int]:
    """Per-group (non)zero parameter audit, mirroring the reference's summaries
    (``model/DeepFMs.py:565-592`` and ``:723-748``)."""
    cnt = (lambda p: int(jnp.sum(p != 0))) if nonzero else (lambda p: int(np.prod(p.shape)))
    groups = {"first_order_embeddings": 0, "second_order_embeddings": 0, "dnn": 0,
              "field_cov_nonzero_sym": 0, "total": 0}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        c = cnt(leaf)
        groups["total"] += c
        if name.startswith(("emb1", "ffm1")):
            groups["first_order_embeddings"] += c
        if name.startswith(("emb2", "ffm2")):
            groups["second_order_embeddings"] += c
        if name.startswith("deep") and ("/w" in name or "/b" in name) and "fc_w" not in name:
            groups["dnn"] += c
    if "field_cov" in params:
        sym = 0.5 * (params["field_cov"] + params["field_cov"].T)
        groups["field_cov_nonzero_sym"] = int(jnp.sum(sym != 0))
    return groups
