"""NFM (Neural Factorization Machine) baseline, TPU-native.

Counterpart of the reference's standalone ``NFM.py`` (575 LoC), which carries
its own near-identical estimator loop. Model structure (reference
``NFM.py:177-280``):

* 1st-order term: per-field scalar embeddings, numeric fields scaled by value;
* deep input:
  - ``interaction_type=True`` → **bi-interaction pooling** over the 2nd-order
    embeddings, ``0.5·((Σ_f e_f)² − Σ_f e_f²)`` → (B, E) (reference
    ``:200-210``, the 2xy = (x+y)²−x²−y² trick);
  - ``interaction_type=False`` → pairwise scalar products
    ``[Σ_e e_i·e_j for i<j]`` → (B, F(F−1)/2) (reference ``:211-218``,
    ``:246-249``);
* MLP: depth-3 tower with NO output head — the logit adds the **sum of the
  last hidden layer** (reference ``:272-278``);
* logit = bias + Σ 1st-order + Σ x_deep.

The reference NFM never calls an init_weights — it relies on torch defaults
(Embedding ~ N(0,1); Linear ~ U(±1/√fan_in)), reproduced here.

Reuses the framework estimator: :class:`NFMEstimator` plugs the NFM forward
into :class:`..train.trainer.DeepFMEstimator` and adds the reference's
``refit`` mode (continue training on train+valid, ``NFM.py:393-432``).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, TrainConfig
from ..ops import embedding as emb_ops
from ..ops import interactions as inter_ops
from ..ops import mlp as mlp_ops


@dataclass(frozen=True)
class NFMConfig(ModelConfig):
    """ModelConfig + NFM's extra knobs. ``use_fm`` marks the FM flavor
    (vs FFM); ``use_deep`` is implicitly True."""
    interaction_type: bool = True         # bi-interaction (True) vs pairwise concat
    deep_activation: str = "relu"         # relu | sigmoid | tanh (reference :252-257)
    sane_init: bool = False               # TPU extension (-nfm_sane_init): scale
                                          # emb2 to N(0, 0.01) like the DeepFwFM
                                          # family instead of the reference's
                                          # uninitialized torch-default N(0,1),
                                          # whose bi-interaction explodes to
                                          # O(F·E) logits (logloss 10-19 on
                                          # tiny-criteo, PARITY.md). Default off
                                          # = faithful chaos.

    def __post_init__(self):
        # NFM composes differently; skip the FM-family mutual-exclusion check
        if len(self.feature_sizes) != self.field_size:
            raise ValueError("feature_sizes length mismatch")


def make_spec(cfg: NFMConfig) -> emb_ops.PackedEmbeddingSpec:
    return emb_ops.make_spec(cfg.feature_sizes, cfg.numerical)


def init_params(key: jax.Array, cfg: NFMConfig, dtype=jnp.float32) -> Dict:
    spec = make_spec(cfg)
    k_bias, k1, k2, k_mlp = jax.random.split(key, 4)
    sane = getattr(cfg, "sane_init", False)
    params: Dict = {"bias": (jnp.asarray([0.01], dtype) if sane
                             else jax.random.normal(k_bias, (1,), dtype))}  # randn(1), :127
    params["emb1"] = emb_ops.init_tables(k1, spec, 1,
                                         scale=(0.01 if sane else 1.0), dtype=dtype)
    params["emb2"] = emb_ops.init_tables(k2, spec, cfg.embedding_size,
                                         scale=(0.01 if sane else 1.0),
                                         dtype=dtype)  # torch default N(0,1)
    f = cfg.field_size
    in_dim = cfg.embedding_size if cfg.interaction_type else f * (f - 1) // 2
    dims = [in_dim] + list(cfg.deep_layers)
    layers = []
    keys = jax.random.split(k_mlp, len(dims) - 1)
    for i, (fi, fo) in enumerate(zip(dims[:-1], dims[1:])):
        bound = 1.0 / np.sqrt(fi)     # torch nn.Linear default init
        kw, kb = jax.random.split(keys[i])
        layers.append({"w": jax.random.uniform(kw, (fi, fo), dtype, -bound, bound),
                       "b": jax.random.uniform(kb, (fo,), dtype, -bound, bound)})
    params["deep"] = {"layers": layers}
    return params


def _activation(name: str):
    return {"sigmoid": jax.nn.sigmoid, "tanh": jnp.tanh}.get(name, jax.nn.relu)


def forward(params: Dict, xi: jax.Array, xv: jax.Array, cfg: NFMConfig, *,
            train: bool = False, rng: Optional[jax.Array] = None,
            lookup_fn=None) -> jax.Array:
    spec = make_spec(cfg)
    lookup = lookup_fn or emb_ops.packed_lookup
    b = xi.shape[0]
    rngs = (jax.random.split(rng, 2) if (train and rng is not None) else [None, None])

    first_order = lookup(params["emb1"], spec, xi, xv)[..., 0]  # (B, F)
    if cfg.is_shallow_dropout and cfg.dropout_shallow[0] > 0:
        first_order = mlp_ops.dropout(rngs[0], first_order, cfg.dropout_shallow[0], train)

    emb2 = lookup(params["emb2"], spec, xi, xv)                 # (B, F, E)
    if cfg.interaction_type:
        deep_in = inter_ops.fm_second_order(emb2)                              # (B, E)
    else:
        # pairwise scalars Σ_e e_i·e_j for i<j (reference :246-249)
        gram = jnp.einsum("bie,bje->bij", emb2, emb2, precision="highest",
                          preferred_element_type=jnp.float32)
        f = cfg.field_size
        iu, ju = np.triu_indices(f, k=1)
        deep_in = gram[:, iu, ju]                                              # (B, F(F-1)/2)

    # deep tower: dropout0 → (linear → act → dropout)×depth, NO output head
    # NFM dropout profile: [0.0, 0.5, 0.5, 0.5] (reference :67)
    act = _activation(cfg.deep_activation)
    rates = (0.0,) + (cfg.dropout_deep,) * cfg.h_depth if cfg.is_deep_dropout \
        else (0.0,) * (cfg.h_depth + 1)
    n_layers = len(params["deep"]["layers"])
    drop_rngs = jax.random.split(rngs[1], n_layers + 1) if (train and rngs[1] is not None) \
        else [None] * (n_layers + 1)
    x = mlp_ops.dropout(drop_rngs[0], deep_in, rates[0], train)
    for i, layer in enumerate(params["deep"]["layers"]):
        x = jnp.dot(x, layer["w"], preferred_element_type=jnp.float32) + layer["b"]
        x = act(x)
        x = mlp_ops.dropout(drop_rngs[i + 1], x, rates[i + 1], train)

    return params["bias"][0] + jnp.sum(first_order, axis=1) + jnp.sum(x, axis=1)


from ..train.trainer import DeepFMEstimator


class NFMEstimator(DeepFMEstimator):
    """NFM with the framework's estimator surface + the reference's refit mode."""

    model_forward = staticmethod(forward)
    model_init = staticmethod(init_params)
    model_spec = staticmethod(make_spec)

    def fit(self, Xi, Xv, y, Xi_valid=None, Xv_valid=None, y_valid=None,
            *, refit: bool = False, **kw):
        super().fit(Xi, Xv, y, Xi_valid, Xv_valid, y_valid, **kw)
        if refit and Xi_valid is not None and len(Xi_valid) > 0:
            # reference NFM.py:393-432: continue on train+valid combined
            self._log("refitting the model")
            c = self.mcfg.num_categorical
            Xi_all = np.concatenate([np.asarray(Xi, np.int32).reshape(-1, c),
                                     np.asarray(Xi_valid, np.int32).reshape(-1, c)])
            Xv_all = np.concatenate([np.asarray(Xv, np.float32),
                                     np.asarray(Xv_valid, np.float32)])
            y_all = np.concatenate([np.asarray(y, np.float32).ravel(),
                                    np.asarray(y_valid, np.float32).ravel()])
            super().fit(Xi_all, Xv_all, y_all, [], [], [], **kw)
            self._log("refit finished")
        return self
