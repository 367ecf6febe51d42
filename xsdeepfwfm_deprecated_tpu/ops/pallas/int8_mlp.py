"""Pallas TPU kernel: fused int8 deep-tower serving pass.

The whole quantized MLP (dynamic input quant → int8×int8 MXU matmul → per-
channel dequant (+bias) → ReLU, per layer, then the bias-free head) runs as
ONE kernel per batch tile: activations never leave VMEM between layers, and
the int8 weights (4× smaller than fp32) are read from HBM once per tile. This
is the serving-side counterpart of the reference's fbgemm static-quantization
path (``quantization.py:72-114``) fused end-to-end.

Shapes are Criteo-default (in 390 → 400 → 400 → 400 → 1) but fully generic;
weights must be pre-quantized per-output-channel (``quantize_symmetric`` with
axis=1).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _int8_mlp_kernel(x_ref, *refs):
    """x_ref (TB, IN); refs = [w_q, w_scale, b] per hidden layer + [fc_q,
    fc_scale] + out_ref (TB, 1)."""
    out_ref = refs[-1]
    n_hidden = (len(refs) - 3) // 3
    x = x_ref[:]
    for i in range(n_hidden):
        w_q, w_scale, b = refs[3 * i], refs[3 * i + 1], refs[3 * i + 2]
        amax = jnp.max(jnp.abs(x))
        x_scale = jnp.maximum(amax, 1e-12) / 127.0
        x_q = jnp.clip(jnp.round(x / x_scale), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(x_q, w_q[:],
                                  dimension_numbers=(((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        x = acc.astype(jnp.float32) * x_scale * w_scale[:].reshape(1, -1) + b[:].reshape(1, -1)
        x = jnp.maximum(x, 0.0)
    fc_q, fc_scale = refs[-3], refs[-2]
    amax = jnp.max(jnp.abs(x))
    x_scale = jnp.maximum(amax, 1e-12) / 127.0
    x_q = jnp.clip(jnp.round(x / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(x_q, fc_q[:],
                              dimension_numbers=(((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    out_ref[:] = acc.astype(jnp.float32) * x_scale * fc_scale[:].reshape(1, -1)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def int8_mlp_pallas(x: jax.Array, layers_q: tuple, fc_q: tuple, *,
                    block_b: int = 512, interpret: bool = False) -> jax.Array:
    """x (B, IN) f32; layers_q = ((w_q int8 (in,out), w_scale (out,), b (out,)), …);
    fc_q = (w_q (H, 1), w_scale (1,)). Returns (B, 1) f32."""
    b, in_dim = x.shape
    block_b = min(block_b, b)
    assert b % block_b == 0
    grid = (b // block_b,)

    operands = [x]
    in_specs = [pl.BlockSpec((block_b, in_dim), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for (w_q, w_scale, bias) in layers_q:
        operands += [w_q, w_scale, bias]
        in_specs += [
            pl.BlockSpec(w_q.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w_scale.shape, lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(bias.shape, lambda i: (0,), memory_space=pltpu.VMEM),
        ]
    w_fc, s_fc = fc_q
    operands += [w_fc, s_fc]
    in_specs += [
        pl.BlockSpec(w_fc.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(s_fc.shape, lambda i: (0,), memory_space=pltpu.VMEM),
    ]

    return pl.pallas_call(
        _int8_mlp_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_b, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.float32),
        interpret=interpret,
    )(*operands)


def pack_quantized_deep(deep_q: Dict) -> tuple:
    """(layers_q, fc_q) tuples from a :class:`...compression.quantization
    .QuantizedModel`'s ``deep_q['net_1']``."""
    net = deep_q["net_1"] if "net_1" in deep_q else deep_q
    layers = tuple((l["w_q"], l["w_scale"], l["b"]) for l in net["layers"])
    fc = (net["fc"]["w_q"], net["fc"]["w_scale"])
    return layers, fc
