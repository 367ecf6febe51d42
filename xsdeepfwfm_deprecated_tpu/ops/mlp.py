"""The deep tower: dropout → (linear → relu → dropout)×depth → fc.

Layer order matches the reference exactly (``model/DeepFMs.py:408-428``):
dropout on the concatenated embeddings first (``net_*_linear_0_dropout``), then
each hidden Linear+ReLU+dropout, finally a bias-free 1-unit head
(``net_*_fc``). Weights are stored ``(in, out)`` so activations hit the MXU as
plain ``x @ w`` matmuls; optional 0/1 masks implement DeepLight's structural
sparsity as XLA-native elementwise weight masking.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp


def dropout(rng: Optional[jax.Array], x: jax.Array, rate: float, train: bool) -> jax.Array:
    """Inverted dropout (torch semantics: scale by 1/(1-p) at train time)."""
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


def init_mlp(key: jax.Array, in_dim: int, hidden: Sequence[int], head_scale: float,
             dtype=jnp.float32) -> Dict:
    """Init one deep net. Hidden layers use the reference's glorot
    ``N(0,1)·sqrt(2/(fan_in+fan_out))`` for weight AND bias
    (``model/DeepFMs.py:483-485``); the fc head uses ``N(0,1)·head_scale``
    where head_scale = sqrt(2/last_layer_size) (``:489-495``)."""
    layers: List[Dict[str, jax.Array]] = []
    dims = [in_dim] + list(hidden)
    keys = jax.random.split(key, len(hidden) + 1)
    for i, (fi, fo) in enumerate(zip(dims[:-1], dims[1:])):
        glorot = (2.0 / (fi + fo)) ** 0.5
        kw, kb = jax.random.split(keys[i])
        layers.append({
            "w": jax.random.normal(kw, (fi, fo), dtype) * glorot,
            "b": jax.random.normal(kb, (fo,), dtype) * glorot,
        })
    fc_w = jax.random.normal(keys[-1], (dims[-1], 1), dtype) * head_scale
    return {"layers": layers, "fc_w": fc_w}


def mlp_forward(net: Dict, x: jax.Array, *, dropout_rates: Sequence[float],
                train: bool = False, rng: Optional[jax.Array] = None,
                masks: Optional[Dict] = None,
                activation=jax.nn.relu) -> jax.Array:
    """(B, in_dim) or (B, F, E) → (B, 1). ``dropout_rates`` has
    len(hidden)+1 entries: rate[0] applies to the input, rate[i] after
    hidden layer i.

    A 3-D input contracts the FIRST layer directly over (F, E) —
    mathematically identical to flattening (``x.reshape(B, -1) @ w``) but
    avoids materializing the flatten: a (B, F, E=10) tensor is lane-padded
    12.8× on TPU, and the train-step trace showed the flatten as a ~0.4 ms
    physical reshape (round 4). Eval-mode output is bit-identical; in train
    mode the input-dropout mask is drawn over the (B, F, E) shape (same
    distribution/count, different RNG element mapping than the flat draw).
    """
    n_layers = len(net["layers"])
    rngs = jax.random.split(rng, n_layers + 1) if (train and rng is not None) else [None] * (n_layers + 1)
    x = dropout(rngs[0], x, dropout_rates[0], train)
    start = 0
    if x.ndim == 3:
        w0 = net["layers"][0]["w"]
        if masks is not None:
            w0 = w0 * masks["layers"][0]
        w0 = w0.reshape(x.shape[1], x.shape[2], -1)          # (F, E, H)
        x = (jnp.einsum("bfe,feh->bh", x, w0,
                        preferred_element_type=jnp.float32)
             + net["layers"][0]["b"])
        x = activation(x)
        x = dropout(rngs[1], x, dropout_rates[1], train)
        start = 1
    for i in range(start, n_layers):
        layer = net["layers"][i]
        w = layer["w"]
        if masks is not None:
            w = w * masks["layers"][i]
        x = jnp.dot(x, w, preferred_element_type=jnp.float32) + layer["b"]
        x = activation(x)
        x = dropout(rngs[i + 1], x, dropout_rates[i + 1], train)
    fc_w = net["fc_w"]
    if masks is not None and masks.get("fc_w") is not None:
        fc_w = fc_w * masks["fc_w"]
    return jnp.dot(x, fc_w, preferred_element_type=jnp.float32)


# ------------------------------------------------------------------- QAT

def qat_mlp_forward(net: Dict, x: jax.Array, *, dropout_rates: Sequence[float],
                    train: bool = False, rng: Optional[jax.Array] = None) -> jax.Array:
    """Deep tower with fake-quant on input + weights + activations (QAT).

    Counterpart of the reference QAT path (``quantization.py:118-134``).
    Simplification vs torch's moving-average observers: scales are the current
    batch abs-max under stop_gradient (straight-through), which the reference
    approaches once observers are frozen near the end of training
    (``model/DeepFMs.py:713-721``).
    """
    from .quantized import fake_quant_per_tensor
    n_layers = len(net["layers"])
    rngs = jax.random.split(rng, n_layers + 1) if (train and rng is not None) \
        else [None] * (n_layers + 1)
    x = fake_quant_per_tensor(x)
    x = dropout(rngs[0], x, dropout_rates[0], train)
    for i, layer in enumerate(net["layers"]):
        w = fake_quant_per_tensor(layer["w"])
        x = jnp.dot(x, w, preferred_element_type=jnp.float32) + layer["b"]
        x = jax.nn.relu(x)
        x = fake_quant_per_tensor(x)
        x = dropout(rngs[i + 1], x, dropout_rates[i + 1], train)
    return jnp.dot(x, fake_quant_per_tensor(net["fc_w"]),
                   preferred_element_type=jnp.float32)
