"""Pallas TPU kernel: fused FwFM pairwise interaction.

Computes ``out[b, e] = 0.5·(Σ_{k,l} R_sym[k,l] E[b,k,e] E[b,l,e]
− Σ_k R_sym[k,k] E[b,k,e]²)`` in one kernel: R symmetrization, the field-axis
contraction (MXU), the diagonal correction and the scale all happen in VMEM on
a batch tile — no (F, F, B, E) or (B, F, E)-sized intermediates ever reach HBM
(the reference materializes the full F²·B·E outer product,
``model/DeepFMs.py:352``).

Layout: the embedding tensor arrives as ``(E, B, F)`` so each per-dim slice
``(TB, F)`` is a contiguous 2-D tile with the field axis on lanes; the E loop
is unrolled (E is small and static).

Falls back to :func:`..interactions.fwfm_second_order` off-TPU; the Pallas
path is exercised in interpret mode by the test suite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import interactions as inter_ops


def _fwfm_kernel(r_ref, emb_ref, out_ref):
    """emb_ref: (E, TB, F) VMEM; r_ref: (F, F) VMEM; out_ref: (TB, E) VMEM."""
    r = r_ref[:]
    rs = 0.5 * (r + r.T)
    diag = jnp.diagonal(rs)                       # (F,)
    e_dim = emb_ref.shape[0]
    for e in range(e_dim):                        # static unroll, E ~ 10
        sl = emb_ref[e]                           # (TB, F)
        # highest precision: match the XLA path's f32 contraction (default MXU
        # bf16 passes cost ~1e-3 rel error on the interaction sums)
        m = jnp.dot(sl, rs, precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)           # Σ_l e_l·R_{lk}
        pair = jnp.sum(sl * m, axis=1)
        dcorr = jnp.sum(sl * sl * diag[None, :], axis=1)
        out_ref[:, e] = 0.5 * (pair - dcorr)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def fwfm_second_order_pallas(emb: jax.Array, r: jax.Array, *,
                             block_b: int = 256, interpret: bool = False) -> jax.Array:
    """(B, F, E), (F, F) → (B, E); B must divide by ``block_b`` (pad upstream)."""
    b, f, e = emb.shape
    block_b = min(block_b, b)
    assert b % block_b == 0, f"batch {b} not divisible by block {block_b}"
    emb_t = jnp.transpose(emb, (2, 0, 1))         # (E, B, F)

    grid = (b // block_b,)
    return pl.pallas_call(
        _fwfm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((f, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((e, block_b, f), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, e), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, e), jnp.float32),
        interpret=interpret,
    )(r, emb_t)


def fwfm_second_order(emb: jax.Array, r: jax.Array, *, use_pallas: bool = None,
                      interpret: bool = False) -> jax.Array:
    """Dispatch: Pallas on TPU (batch divisible by tile), XLA contraction
    otherwise."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and emb.shape[0] % 256 == 0
    if use_pallas or interpret:
        return fwfm_second_order_pallas(emb, r, interpret=interpret)
    return inter_ops.fwfm_second_order(emb, r)
