"""Row-sharded embedding lookup with an explicit cross-chip exchange.

The reference's performance ceiling is its embedding layer: per-field
``nn.Embedding`` modules looked up in a Python loop on ONE device
(``model/DeepFMs.py:302-335``). Here the packed table's rows are sharded over
the mesh's ``model`` axis and the lookup runs under ``shard_map``:

1. every device holds a contiguous row range of the packed table
   ``[shard · rows_local, (shard+1) · rows_local)``;
2. batch indices are replicated along ``model`` (they are tiny int32),
   each device gathers the hits that live in its range and zero-fills misses;
3. one ``psum`` over ``model`` combines partials — each global row lives on
   exactly one shard, so the sum IS the select. The psum rides ICI; its
   transpose (backward) is the identity, so gradients scatter-add into each
   shard's local rows with no extra communication.

This is a dense-exchange variant of the all-to-all embedding exchange (cost
``B_local · F · E`` per chip per direction, independent of table size); QR
quotient/remainder tables are small and stay replicated — the
sharding-friendly hash-trick fallback.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import embedding as emb_ops
from ..ops.embedding import PackedEmbeddingSpec
from .mesh import DATA_AXIS, MODEL_AXIS

try:  # JAX ≥ 0.6 exports shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def sharded_lookup_local(table_local: jax.Array, gidx: jax.Array,
                         axis_name: str = MODEL_AXIS) -> jax.Array:
    """Inside shard_map: gather global rows from a row-sharded table.

    ``table_local``: this shard's contiguous row block; ``gidx``: global row
    indices (B, F), identical on every shard along ``axis_name``.
    """
    rows_local = table_local.shape[0]
    shard = jax.lax.axis_index(axis_name)
    local = gidx - shard * rows_local
    valid = (local >= 0) & (local < rows_local)
    got = jnp.take(table_local, jnp.clip(local, 0, rows_local - 1), axis=0)
    partial_rows = jnp.where(valid[..., None], got, jnp.zeros_like(got))
    return jax.lax.psum(partial_rows, axis_name)


def make_sharded_lookup(mesh: Mesh, spec: PackedEmbeddingSpec):
    """Build a drop-in replacement for :func:`..ops.embedding.packed_lookup`
    whose dense-table gather runs as the shard_map exchange above.

    Returned fn must be called on GLOBAL arrays under ``jax.jit`` with the
    shardings from :mod:`.mesh` (dense tables ``P('model', None)``, batch
    ``P('data', ...)``).
    """

    def lookup(tables: Dict[str, jax.Array], spec_: PackedEmbeddingSpec,
               xi: jax.Array, xv: jax.Array) -> jax.Array:
        raw, scale = emb_ops.build_indices(spec_, xi, xv)
        offs = jnp.asarray(spec_.dense_offsets, dtype=raw.dtype)[None, :]
        gidx = jnp.clip(offs + raw, 0, tables["dense"].shape[0] - 1)

        exchange = shard_map(
            partial(sharded_lookup_local, axis_name=MODEL_AXIS),
            mesh=mesh,
            in_specs=(P(MODEL_AXIS, None), P(DATA_AXIS, None)),
            out_specs=P(DATA_AXIS, None, None),
        )
        dense_emb = exchange(tables["dense"], gidx)

        if spec_.has_qr:
            qr_emb = emb_ops._qr_gather(tables, spec_, raw)  # q/r replicated
            mask = jnp.asarray(spec_.is_qr_field)[None, :, None]
            emb = jnp.where(mask, qr_emb, dense_emb)
        else:
            emb = dense_emb
        return emb * scale[..., None]

    return lookup
