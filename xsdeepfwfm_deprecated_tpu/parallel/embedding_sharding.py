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
    # plain take here, NOT fast_take_rows: the custom-vjp gather makes
    # shard_map lose the vma info that lets it transpose this psum to the
    # IDENTITY, doubling the exchange's collective volume (asserted in
    # test_compiled_collective_bytes) — a worse trade than the gather knee.
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


# ---------------------------------------------------------------------------
# All-to-all exchange (DLRM-style model→data parallel transition)
# ---------------------------------------------------------------------------

def a2a_lookup_local(table_local: jax.Array, gidx_local: jax.Array,
                     axis_name: str = MODEL_AXIS) -> jax.Array:
    """Inside shard_map: row-sharded gather with an all-to-all result exchange.

    Here the BATCH is sharded over the ``model`` axis too (each chip owns
    ``b_local = B / (data·model)`` examples), so instead of psum-ing full
    ``(B_local, F, E)`` partials, each chip:

    1. all-gathers its model-group's index blocks (tiny int32 traffic);
    2. gathers the rows IT owns for every sibling's indices;
    3. all-to-alls the looked-up vectors so each chip receives exactly its own
       examples' vectors — ICI volume per chip ``≈ b_local·F·E``, a ``model``-
       factor less than the psum exchange, the classic DLRM embedding
       all-to-all (BASELINE.json north star).

    Each global row is owned by exactly one chip, so summing the received
    slots reconstructs the lookup exactly.
    """
    my = jax.lax.axis_index(axis_name)
    rows_local = table_local.shape[0]
    all_idx = jax.lax.all_gather(gidx_local, axis_name)            # (M, b, F)
    local = all_idx - my * rows_local
    valid = (local >= 0) & (local < rows_local)
    # fast_take_rows: windowed fast-path gather + windowed-scatter backward
    # (a full-Criteo shard exceeds the gather emitter's knee); needs
    # check_vma=False on the enclosing shard_map (custom_vjp hides vma), the
    # backward collective here is the all-to-all either way.
    got = emb_ops.fast_take_rows(table_local, local)
    part = jnp.where(valid[..., None], got, jnp.zeros_like(got))   # (M, b, F, E)
    recv = jax.lax.all_to_all(part, axis_name, split_axis=0, concat_axis=0)
    return jnp.sum(recv, axis=0)                                   # (b, F, E)


def a2a_lookup_local_super(ptable_local: jax.Array, gidx_local: jax.Array,
                           k: int, e: int, axis_name=MODEL_AXIS) -> jax.Array:
    """:func:`a2a_lookup_local` for a SUPER-ROW-packed table shard.

    ``ptable_local``: this chip's contiguous block of (k·E)-wide super-row
    lines (``ops/superpack.py`` layout — global super-rows are sharded, so a
    logical row ``i`` lives on the chip owning super-row ``i // k``). The
    gather moves the same 512-byte line a lane-padded (N, E) gather would
    have, but the local scatter-add in the backward (and the Adam moment
    chain outside) runs on the compact ≤7%-padded layout instead of the
    12.8×-padded flat one — the same effect that took the single-device
    train step 12.05 → 4.4 ms (RESULTS.md "Super-row table layout"),
    applied per shard. Exchange volume is unchanged: the all-to-all carries
    E-wide extracted vectors, not the raw lines.
    """
    my = jax.lax.axis_index(axis_name)
    n2_local = ptable_local.shape[0]
    all_idx = jax.lax.all_gather(gidx_local, axis_name)            # (M, b, F)
    sup = all_idx // k
    sub = all_idx - sup * k
    lsup = sup - my * n2_local
    valid = (lsup >= 0) & (lsup < n2_local)
    lines = emb_ops.fast_take_rows(ptable_local,
                                   jnp.clip(lsup, 0, n2_local - 1))
    lines = lines.reshape(lines.shape[:-1] + (k, e))
    oh = jax.nn.one_hot(sub, k, dtype=ptable_local.dtype)
    # one-hot extraction: the measured-fast form for both directions (its
    # autodiff backward is the one-hot expand + row scatter-add — the 2-D
    # windowed-scatter alternative measured 283× slower, RESULTS.md
    # "Super-row extraction/scatter variants")
    got = jnp.einsum("...k,...ke->...e", oh, lines)
    part = jnp.where(valid[..., None], got, jnp.zeros_like(got))
    recv = jax.lax.all_to_all(part, axis_name, split_axis=0, concat_axis=0)
    return jnp.sum(recv, axis=0)                                   # (b, F, E)


def _super_exchange(mesh: Mesh, tables, gidx, table_axes, batch_axes):
    """shard_map wiring shared by the a2a/a2a_grid packed-table paths.

    ``table_axes``: the mesh axes the super-rows are sharded over (also the
    exchange's collective axes); ``batch_axes``: the axes the batch is
    sharded over (the a2a family shards the batch over BOTH mesh axes).
    """
    dense = tables["dense"]
    e = dense["edim"].shape[0]
    k = dense["packed"].shape[1] // e
    exchange = shard_map(
        partial(a2a_lookup_local_super, k=k, e=e, axis_name=table_axes),
        mesh=mesh,
        in_specs=(P(table_axes, None), P(batch_axes, None)),
        out_specs=P(batch_axes, None, None),
        check_vma=False,
    )
    return exchange(dense["packed"], gidx)


def make_a2a_lookup(mesh: Mesh, spec: PackedEmbeddingSpec):
    """Drop-in lookup with batch sharded over BOTH mesh axes.

    Use with batch sharding ``P(('data','model'), None)`` — after the lookup,
    the whole network (interactions + MLP) runs data-parallel over the
    combined device grid, so the dense compute also scales with the ``model``
    axis instead of being replicated along it.
    """

    def lookup(tables, spec_, xi: jax.Array, xv: jax.Array) -> jax.Array:
        from ..ops import superpack
        raw, scale = emb_ops.build_indices(spec_, xi, xv)
        offs = jnp.asarray(spec_.dense_offsets, dtype=raw.dtype)[None, :]
        if superpack.is_packed(tables["dense"]):
            d = tables["dense"]
            n_logical = d["packed"].shape[0] * (
                d["packed"].shape[1] // d["edim"].shape[0])
            gidx = jnp.clip(offs + raw, 0, n_logical - 1)
            dense_emb = _super_exchange(mesh, tables, gidx, MODEL_AXIS,
                                        (DATA_AXIS, MODEL_AXIS))
        else:
            gidx = jnp.clip(offs + raw, 0, tables["dense"].shape[0] - 1)
            exchange = shard_map(
                partial(a2a_lookup_local, axis_name=MODEL_AXIS),
                mesh=mesh,
                in_specs=(P(MODEL_AXIS, None), P((DATA_AXIS, MODEL_AXIS), None)),
                out_specs=P((DATA_AXIS, MODEL_AXIS), None, None),
                check_vma=False,
            )
            dense_emb = exchange(tables["dense"], gidx)
        if spec_.has_qr:
            qr_emb = emb_ops._qr_gather(tables, spec_, raw)  # replicated q/r
            mask = jnp.asarray(spec_.is_qr_field)[None, :, None]
            emb = jnp.where(mask, qr_emb, dense_emb)
        else:
            emb = dense_emb
        return emb * scale[..., None]

    return lookup


def a2a_batch_sharding(mesh: Mesh):
    """(xi/xv, y) shardings for the all-to-all path: batch over both axes."""
    from jax.sharding import NamedSharding
    return (NamedSharding(mesh, P((DATA_AXIS, MODEL_AXIS), None)),
            NamedSharding(mesh, P((DATA_AXIS, MODEL_AXIS))))


def setup_exchange(mesh: Mesh, spec: PackedEmbeddingSpec, exchange: str):
    """Resolve an exchange name to its full wiring — the ONE place that knows
    which exchange shards what (trainer, benchmarks and the multi-host dryrun
    all call this instead of re-deriving it).

    Returns ``(lookup_fn, table_axes, table_shards, batch_over_both)``:
    ``lookup_fn`` is None when the exchange degenerates to replicated tables
    (a2a/psum with a trivial model axis — pure data parallelism);
    ``table_axes``/``table_shards`` feed ``mesh.param_shardings`` /
    ``mesh.pad_rows_for_mesh``; ``batch_over_both`` says whether the batch
    dimension spans both mesh axes (a2a family) or ``data`` only (psum).
    """
    m = mesh.shape[MODEL_AXIS]
    n = mesh.devices.size
    if exchange == "a2a_grid":
        if n > 1:
            return make_grid_lookup(mesh, spec), GRID_AXES, n, True
        return None, MODEL_AXIS, 1, True
    if exchange == "a2a":
        if m > 1:
            return make_a2a_lookup(mesh, spec), MODEL_AXIS, m, True
        return None, MODEL_AXIS, 1, False
    if exchange == "psum":
        if m > 1:
            return make_sharded_lookup(mesh, spec), MODEL_AXIS, m, False
        return None, MODEL_AXIS, 1, False
    raise ValueError(f"unknown exchange {exchange!r} (a2a_grid | a2a | psum)")


# ---------------------------------------------------------------------------
# Full-grid exchange: tables sharded over EVERY device (no data-axis replica)
# ---------------------------------------------------------------------------

GRID_AXES = (DATA_AXIS, MODEL_AXIS)


def make_grid_lookup(mesh: Mesh, spec: PackedEmbeddingSpec):
    """All-to-all lookup with table rows sharded over the FULL device grid.

    The ``model``-axis a2a/psum exchanges replicate each table shard along
    ``data``, so XLA must all-reduce the scatter-added table GRADIENTS over
    the data axis every step — a dense, table-size-proportional collective
    (measured in ``tests/test_sharding.py::test_compiled_collective_bytes``:
    ``rows_local·E·4`` bytes/chip/step; ~27 MB at full-Criteo scale, dwarfing
    the batch-proportional exchange). Sharding rows over all ``d·m`` devices
    means every row (and its optimizer moments) lives on exactly ONE chip:
    gradients arrive via the backward all-to-all and scatter-add locally —
    no table-sized collective exists anywhere in the compiled step.

    This is the classic DLRM placement (model-parallel tables + data-parallel
    dense, one exchange each way per step) and the product default; use with
    batch sharded ``P(('data','model'), ...)`` and tables padded to a
    ``mesh.devices.size`` row multiple.
    """

    def lookup(tables, spec_, xi: jax.Array, xv: jax.Array) -> jax.Array:
        from ..ops import superpack
        raw, scale = emb_ops.build_indices(spec_, xi, xv)
        offs = jnp.asarray(spec_.dense_offsets, dtype=raw.dtype)[None, :]
        if superpack.is_packed(tables["dense"]):
            d = tables["dense"]
            n_logical = d["packed"].shape[0] * (
                d["packed"].shape[1] // d["edim"].shape[0])
            gidx = jnp.clip(offs + raw, 0, n_logical - 1)
            dense_emb = _super_exchange(mesh, tables, gidx, GRID_AXES,
                                        GRID_AXES)
        else:
            gidx = jnp.clip(offs + raw, 0, tables["dense"].shape[0] - 1)
            exchange = shard_map(
                partial(a2a_lookup_local, axis_name=GRID_AXES),
                mesh=mesh,
                in_specs=(P(GRID_AXES, None), P(GRID_AXES, None)),
                out_specs=P(GRID_AXES, None, None),
                check_vma=False,
            )
            dense_emb = exchange(tables["dense"], gidx)
        if spec_.has_qr:
            qr_emb = emb_ops._qr_gather(tables, spec_, raw)  # replicated q/r
            mask = jnp.asarray(spec_.is_qr_field)[None, :, None]
            emb = jnp.where(mask, qr_emb, dense_emb)
        else:
            emb = dense_emb
        return emb * scale[..., None]

    return lookup
