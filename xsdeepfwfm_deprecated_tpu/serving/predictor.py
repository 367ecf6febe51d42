"""Serving predictor: warm jitted forward over fp32 / pruned / int8 models.

The serving-time counterpart of the reference's estimator prediction API
(``model/DeepFMs.py:848-903``), factored out of the trainer so a model can be
loaded from a checkpoint and served without any training machinery.
"""

from __future__ import annotations

from typing import Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..compression.quantization import QuantizedModel, quantized_forward
from ..config import ModelConfig
from ..models import deepfwfm
from .compaction import CompactModel, compact_forward


class Predictor:
    """Holds (params | QuantizedModel | CompactModel) + a compiled forward;
    batch or single-example."""

    def __init__(self, model: Union[Dict, QuantizedModel, CompactModel],
                 cfg: Optional[ModelConfig] = None, layout: str = "auto"):
        # the model is always a jitted-function ARGUMENT, never a closure —
        # closed-over multi-MB arrays become graph constants (minutes of
        # compile, ~80x slower dispatch; measured, see RESULTS.md)
        if isinstance(model, CompactModel):
            self.cfg = model.cfg
            self._model = jax.device_put(model)
            self._fn = jax.jit(compact_forward)
        elif isinstance(model, QuantizedModel):
            self.cfg = model.cfg
            if layout in ("auto", "grouped"):
                # product default (round 5): field-grouped sub-knee tables,
                # measured 3.2× on the int8 lookup; group_quantized_tables
                # is a no-op for QR/FFM configs
                from ..compression.quantization import group_quantized_tables
                model = group_quantized_tables(model)
            self._model = jax.device_put(model)
            fused = (jax.default_backend() == "tpu" and model.act_scales is None
                     and model.deep_q is not None)
            self._fn = jax.jit(lambda m, xi, xv: quantized_forward(
                m, xi, xv, use_fused_kernel=fused))
        else:
            assert cfg is not None, "fp32 params need an explicit ModelConfig"
            self.cfg = cfg
            from ..ops import superpack
            from ..ops.embedding import packed_lookup_serving
            if layout == "super" and not superpack.params_are_packed(model):
                # layout asymmetry, measured round 4 (RESULTS.md "Super-row
                # table layout"): the super layout wins the TRAINING dispatch
                # 2.75× (in-scan big-operand gathers are the bottleneck
                # there) but LOSES the out-of-scan serving forward (1.91 vs
                # 1.39 ms/b8192 — the E-slice extraction re-reads the
                # gathered 120-wide lines, while the flat single gather on
                # per-field-distributed indices is already fast out-of-scan).
                # Serving therefore never auto-selects "super"; it stays
                # available for A/B.
                spec = deepfwfm.make_embedding_spec(cfg)
                model = superpack.pack_params(jax.device_get(model), spec)
            lookup = (superpack.super_lookup
                      if superpack.params_are_packed(model)
                      else packed_lookup_serving)
            groupable = (not cfg.use_ffm and not cfg.qr_flag
                         and not superpack.params_are_packed(model)
                         and any(key in model and "dense" in model[key]
                                 for key in ("emb1", "emb2")))
            if layout in ("auto", "grouped") and groupable:
                # PRODUCT DEFAULT (round 5): the gather knee is ~1 MB of
                # per-lane-column bytes, so the packed table is pre-split
                # into contiguous field groups each under the knee — same
                # logits, G sub-knee gathers; beat flat 1.67× end-to-end in
                # bench.py's A/B (9.69M vs 5.82M ex/s). "auto" selects it
                # whenever the model is an unpacked dense-dict (QR/FFM/super
                # keep flat). RESULTS.md "Field-grouped serving gather".
                from ..ops.embedding import (grouped_lookup_serving,
                                             split_serving_tables)
                spec = deepfwfm.make_embedding_spec(cfg)
                model = dict(model)
                for key in ("emb1", "emb2"):
                    if key in model and "dense" in model[key]:
                        model[key] = split_serving_tables(model[key], spec)
                lookup = grouped_lookup_serving
            self._model = jax.device_put(model)
            self._fn = jax.jit(lambda p, xi, xv: deepfwfm.forward(
                p, xi, xv, cfg, lookup_fn=lookup))

    def logits(self, xi: np.ndarray, xv: np.ndarray) -> np.ndarray:
        return np.asarray(self._fn(self._model, jnp.asarray(xi, jnp.int32),
                                   jnp.asarray(xv, jnp.float32)))

    def predict_proba(self, xi: np.ndarray, xv: np.ndarray) -> np.ndarray:
        return 1.0 / (1.0 + np.exp(-self.logits(xi, xv).astype(np.float64)))

    def predict(self, xi: np.ndarray, xv: np.ndarray) -> np.ndarray:
        return self.predict_proba(xi, xv) > 0.5

    def warmup(self, batch_sizes=(1, 8192)):
        """Pre-compile for the serving batch shapes."""
        c = self.cfg.num_categorical
        n = self.cfg.numerical
        for b in batch_sizes:
            xi = np.zeros((b, c), np.int32)
            xv = np.zeros((b, n), np.float32)
            jax.block_until_ready(self._fn(self._model, jnp.asarray(xi),
                                           jnp.asarray(xv)))
        return self
