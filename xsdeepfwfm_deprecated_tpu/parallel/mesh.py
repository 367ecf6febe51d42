"""Device meshes and sharding specs for multi-chip / multi-host scaling.

The reference has NO distributed execution of any kind (its ``-use_multi``
flag is parsed and consumed nowhere, ``utils/parameters.py:9``; multi-GPU is
documented broken, ``model/QREmbeddingBag.py:46``). This module is the
TPU-native scaling story:

* a named 2-D mesh ``('data', 'model')`` — batch parallel over ``data``,
  embedding-table rows sharded over ``model`` or (grid exchange, the default)
  over the FULL device grid;
* NamedShardings for the parameter pytree: packed tables row-sharded
  (tables are ~97% of DeepFwFM parameters), everything else
  (R matrix, MLP, linear heads) replicated;
* multi-host initialization via ``jax.distributed``.

Collectives ride ICI inside a slice / DCN across hosts — all inserted by XLA
from the sharding annotations, or issued explicitly in
:mod:`.embedding_sharding` for the lookup exchange.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices=None) -> Mesh:
    """Build a ``(data, model)`` mesh. ``data=None`` uses all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None or data <= 0:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model <= n, f"mesh {data}x{model} needs more than {n} devices"
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (no-op on a single host). The counterpart of the
    reference's nonexistent NCCL/MPI layer: JAX's distributed runtime +
    XLA collectives."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


_TABLE_NAMES = ("emb1", "emb2", "ffm1", "ffm2")


def _is_dense_table_path(path) -> bool:
    """True for the dense-table leaf of any embedding group.

    Matches both parameter pytrees (``emb2/dense``) and optimizer-state trees
    that mirror them (``0/mu/emb2/dense`` for Adam moments), so the same
    pad/shard helpers apply to params and opt_state alike. When the dense
    table is in the super-row layout (``ops/superpack.py``) the shardable
    leaf is ``emb2/dense/packed`` — its zero-size ``edim`` sibling stays
    replicated (it carries no rows, only the static E marker).
    """
    names = [str(getattr(k, "key", getattr(k, "idx", k))) for k in path]
    if not names or not any(n in _TABLE_NAMES for n in names):
        return False
    return (names[-1] == "dense"
            or (names[-1] == "packed" and "dense" in names))


def param_shardings(params: Dict, mesh: Mesh, table_axes=MODEL_AXIS) -> Dict:
    """NamedShardings for the parameter pytree: embedding tables row-sharded
    over ``table_axes`` (``model`` for the model-axis exchanges; the full
    ``('data','model')`` grid for the grid exchange, which removes the dense
    table-gradient all-reduce); everything else replicated. Also valid for
    optimizer-state trees whose leaves mirror the parameter structure (Adam
    moments)."""
    table_s = NamedSharding(mesh, P(table_axes, None))
    n_shards = int(np.prod([mesh.shape[a] for a in (
        table_axes if isinstance(table_axes, tuple) else (table_axes,))]))
    repl = NamedSharding(mesh, P())

    def assign(path, leaf):
        if _is_dense_table_path(path):
            # only the dense packed table is sharded; q/r QR tables are tiny
            if getattr(leaf, "ndim", 0) == 2 and leaf.shape[0] % n_shards == 0:
                return table_s
        return repl

    return jax.tree_util.tree_map_with_path(assign, params)


def batch_shardings(mesh: Mesh) -> Tuple[NamedSharding, NamedSharding, NamedSharding]:
    """(xi, xv, y/mask) shardings: batch dim over ``data``, replicated over ``model``."""
    s2 = NamedSharding(mesh, P(DATA_AXIS, None))
    s1 = NamedSharding(mesh, P(DATA_AXIS))
    return s2, s2, s1


def pad_rows_for_mesh(params: Dict, mesh: Mesh, shards: Optional[int] = None) -> Dict:
    """Pad packed dense tables so row counts divide the shard count
    (default: the ``model`` axis size; the grid exchange passes
    ``mesh.devices.size``).

    Pad rows sit past every real global index (indices never reach them), so
    semantics are unchanged; they are carried as zeros.
    """
    m = shards if shards is not None else mesh.shape[MODEL_AXIS]
    if m <= 1:
        return params
    import jax.numpy as jnp

    def pad(path, leaf):
        if _is_dense_table_path(path) and getattr(leaf, "ndim", 0) == 2:
            rows = leaf.shape[0]
            target = -(-rows // m) * m
            if target != rows:
                return jnp.concatenate(
                    [leaf, jnp.zeros((target - rows,) + leaf.shape[1:], leaf.dtype)], 0)
        return leaf

    return jax.tree_util.tree_map_with_path(pad, params)


def unpad_rows(tree: Dict, dense_rows: int) -> Dict:
    """Inverse of :func:`pad_rows_for_mesh`: slice every packed dense table
    (and its optimizer-moment mirrors) back to ``dense_rows`` real rows, so
    checkpoints saved from a sharded run load into unsharded models."""

    def unpad(path, leaf):
        if (_is_dense_table_path(path) and getattr(leaf, "ndim", 0) == 2
                and leaf.shape[0] > dense_rows):
            return leaf[:dense_rows]
        return leaf

    return jax.tree_util.tree_map_with_path(unpad, tree)


def batch_axes(a2a: bool):
    """The mesh axes the batch dimension is sharded over: the all-to-all
    exchange shards the batch over BOTH axes (DLRM-style model→data
    transition); the psum exchange and pure data-parallel shard over ``data``
    only, with indices replicated along ``model``."""
    return (DATA_AXIS, MODEL_AXIS) if a2a else DATA_AXIS


def batch_shardings_dict(mesh: Mesh, axes, stacked: bool = False) -> Dict[str, NamedSharding]:
    """Shardings for a training batch dict {xi, xv, y, mask}.

    ``stacked=True`` produces shardings for (K, B, ...) multi-step stacks
    (scan dimension replicated, batch dimension sharded).
    """
    lead = (None,) if stacked else ()
    s2 = NamedSharding(mesh, P(*lead, axes, None))
    s1 = NamedSharding(mesh, P(*lead, axes))
    return {"xi": s2, "xv": s2, "y": s1, "mask": s1, "teacher": s1}
