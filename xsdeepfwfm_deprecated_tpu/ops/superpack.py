"""Super-row packed embedding tables: collapse TPU lane padding 12.8× → 1.07×.

The motivating arithmetic (round-4 design; constants measured in round 3 with
D2H-forced timing, see RESULTS.md "Measurement methodology"):

* A ``(N, E)`` f32 table with E=10 is lane-padded to 128 on TPU — the
  full-Criteo emb2 table (1,330,432 × 10, 53 MB logical) physically occupies
  ~681 MB of HBM, and EVERY dense pass over it (the Adam update chain, the
  backward scatter-add's zero-initialized gradient, pruning threshold scans)
  pays the 12.8× padding tax. Round 3 measured the b=2048 train step's dense
  Adam chain at ~4.7 ms — ≈ 10% of HBM peak on logical bytes, ≈ peak on
  PADDED bytes.
* The TPU gather/scatter emitters switch to a slow per-row strategy once the
  operand exceeds ~2**19 bytes per lane column (rows × itemsize, measured
  round 3 — :data:`..ops.embedding.FAST_GATHER_BYTES`). At (1.33M, 10) the
  table needed an 11-window routed/windowed treatment.

Packing ``k = 128 // E`` logical rows into one physical "super-row" of width
``k·E ≤ 128`` fixes both at once:

* physical layout ``(ceil(N/k), k·E)`` has ≤ 7% lane waste (120/128 for
  E=10) — dense passes get ~12× cheaper;
* full-Criteo's super-row count 110,870 × 4 B = 443 KB sits UNDER the
  fast-path knee — the whole packed table becomes a single fast-path
  gather/scatter operand, no routing or windowing required (tables whose
  super-row count still exceeds the knee fall back to the windowed forms).

A lookup gathers the 512-byte super-row line containing the target row —
the same line a padded ``(N, E)`` gather would have moved — then extracts
the E-wide slice with a one-hot contraction (MXU-trivial). The backward
expands each E-wide cotangent into its super-row position (one-hot outer
product) and windowed-scatter-adds into the COMPACT layout.

Semantics are identical to :func:`..ops.embedding.packed_lookup` /
``packed_lookup_serving`` (per-field index clipping included), so the
reference forward semantics (``/root/reference/model/DeepFMs.py:302-335``:
numeric row-0 × value, categorical lookup) are preserved bit-for-bit in
fp32. Used by the trainer (single-device path) and the serving Predictor;
checkpoints always store the logical ``(N, E)`` layout for portability.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from . import embedding as emb_ops
from .embedding import PackedEmbeddingSpec, _clip_per_field, _fast_take_impl, \
    _windowed_scatter_add

SUPER_LANES = 128


def pack_factor(embedding_dim: int) -> int:
    """Rows per super-row: as many E-wide rows as fit in one 128-lane line."""
    return max(SUPER_LANES // embedding_dim, 1)


def pack_table(table: jax.Array) -> Dict[str, jax.Array]:
    """(N, E) → {"packed": (ceil(N/k), k·E), "edim": (E, 0) shape marker}.

    The zero-size ``edim`` leaf carries E statically through the pytree (the
    packed width k·E alone is ambiguous — 120 could be 12×10 or 24×5); it
    costs no memory, checkpoints/optimizers/pruning map over it harmlessly.
    """
    n, e = table.shape
    k = pack_factor(e)
    n2 = -(-n // k)
    if n2 * k != n:
        table = jnp.pad(table, ((0, n2 * k - n), (0, 0)))
    return {"packed": table.reshape(n2, k * e),
            "edim": jnp.zeros((e, 0), table.dtype)}


def unpack_table(packed: Dict[str, jax.Array], n_rows: int) -> jax.Array:
    e = packed["edim"].shape[0]
    return packed["packed"].reshape(-1, e)[:n_rows]


def is_packed(tables) -> bool:
    return isinstance(tables, dict) and "packed" in tables


def _tree_map_packed(fn, tree):
    """Apply ``fn`` to every packed-table subdict in ``tree`` (params or a
    params-shaped optimizer-state subtree)."""
    return jax.tree.map(fn, tree, is_leaf=is_packed)


def pack_params(params, spec: PackedEmbeddingSpec, only=None):
    """Pack every eligible table subdict ({"dense": (N, E)}) in a params
    pytree. QR (q/r) tables are packed with their own dims. Non-table leaves
    pass through. ``only`` restricts packing to the named table keys — the
    mesh-super path packs ``("dense",)`` only, because the sharded exchanges
    keep the tiny q/r tables replicated in their flat layout
    (:func:`..parallel.embedding_sharding.make_grid_lookup`)."""

    def pack_tables(node):
        if isinstance(node, dict) and "dense" in node and node["dense"].ndim == 2:
            out = dict(node)
            for key in ("dense", "q", "r"):
                if key in node and (only is None or key in only):
                    out[key] = pack_table(node[key])
            return out
        return node

    return jax.tree.map(
        pack_tables, params,
        is_leaf=lambda n: isinstance(n, dict) and "dense" in n)


def unpack_params(params, spec: PackedEmbeddingSpec):
    """Inverse of :func:`pack_params` — restore logical (N, E) tables."""
    rows = {"dense": max(spec.dense_rows, 1), "q": spec.q_rows, "r": spec.r_rows}

    def unpack_tables(node):
        if isinstance(node, dict) and "dense" in node and is_packed(node["dense"]):
            return {key: unpack_table(t, rows[key]) if is_packed(t) else t
                    for key, t in node.items()}
        return node

    return jax.tree.map(
        unpack_tables, params,
        is_leaf=lambda n: isinstance(n, dict) and "dense" in n)


def params_are_packed(params) -> bool:
    for node in jax.tree.leaves(
            params, is_leaf=lambda n: isinstance(n, dict) and "dense" in n):
        if isinstance(node, dict) and "dense" in node:
            return is_packed(node["dense"])
    return False


# ---------------------------------------------------------------------------
# gather from the super-row layout (custom vjp: compact-layout scatter-add bwd)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def packed_take_rows(k: int, n_rows: int, ptable: jax.Array, idx: jax.Array
                     ) -> jax.Array:
    """``logical_table[clip(idx, 0, n_rows-1)]`` from the (N2, k·E) layout.

    Forward: one (windowed-if-needed) gather of super-rows + one-hot
    extraction of the E-wide slice. Backward: one-hot expansion of the
    cotangent into super-row positions + windowed scatter-add into the
    COMPACT layout (the whole point — the dense gradient materializes at
    1.07× logical bytes instead of 12.8×).
    """
    return _packed_take_impl(k, n_rows, ptable, idx)


def _packed_take_impl(k, n_rows, ptable, idx):
    e = ptable.shape[1] // k
    cidx = jnp.clip(idx, 0, max(n_rows - 1, 0))
    if k == 1:
        return _fast_take_impl(ptable, cidx)
    sup = cidx // k
    sub = cidx - sup * k
    lines = _fast_take_impl(ptable, sup)                 # idx.shape + (k*E,)
    lines = lines.reshape(idx.shape + (k, e))
    oh = jax.nn.one_hot(sub, k, dtype=ptable.dtype)      # idx.shape + (k,)
    return jnp.einsum("...k,...ke->...e", oh, lines)


def _packed_take_fwd(k, n_rows, ptable, idx):
    out = _packed_take_impl(k, n_rows, ptable, idx)
    proto = jax.lax.slice_in_dim(ptable, 0, 0, axis=0)   # static shape/dtype
    return out, (ptable.shape[0], proto, idx)


def _packed_take_bwd(k, n_rows, res, g):
    n2, proto, idx = res
    e = proto.shape[1] // k
    g = g.astype(proto.dtype)
    cidx = jnp.clip(idx, 0, max(n_rows - 1, 0)).reshape(-1)
    sup = cidx // k
    if k == 1:
        upd = g.reshape(-1, e)
    else:
        sub = cidx - sup * k
        oh = jax.nn.one_hot(sub, k, dtype=proto.dtype)   # (M, k)
        upd = jnp.einsum("mk,me->mke", oh, g.reshape(-1, e)).reshape(-1, k * e)
    grad = _windowed_scatter_add(n2, sup, upd)
    return grad, np.zeros(idx.shape, dtype=jax.dtypes.float0)


packed_take_rows.defvjp(_packed_take_fwd, _packed_take_bwd)


# ---------------------------------------------------------------------------
# field-level lookup on super-packed tables (drop-in lookup_fn)
# ---------------------------------------------------------------------------


def super_lookup(tables: Dict, spec: PackedEmbeddingSpec, xi: jax.Array,
                 xv: jax.Array) -> jax.Array:
    """→ (B, F, E); drop-in for ``packed_lookup``/``packed_lookup_serving``
    on super-packed tables (falls through to ``packed_lookup`` when handed
    unpacked tables, so one bound lookup_fn serves both states).

    Numeric fields read their rows from a STATIC unpacked slice of the first
    super-rows (no gather — reference ``model/DeepFMs.py:302-304`` numeric
    row-0 × value semantics); categorical fields go through ONE
    :func:`packed_take_rows` gather. Per-field clipping identical to the
    unpacked paths.
    """
    if not is_packed(tables["dense"]):
        return emb_ops.packed_lookup(tables, spec, xi, xv)
    num = spec.numerical
    assert all(n == 1 for n in spec.feature_sizes[:num]), \
        "numeric fields must be leading single-row slots"
    dense = tables["dense"]
    e = dense["edim"].shape[0]
    k = dense["packed"].shape[1] // e
    n_rows = max(spec.dense_rows, 1)
    xi = _clip_per_field(xi, spec.feature_sizes[num:])
    parts = []
    if num:
        head = jax.lax.slice_in_dim(dense["packed"], 0, -(-num // k), axis=0)
        nrow = head.reshape(-1, e)[:num]                    # (num, E) static
        parts.append(xv[..., None] * nrow[None])            # (B, num, E)
    cat_offs = jnp.asarray(spec.dense_offsets[num:], xi.dtype)[None, :]
    out_cat = packed_take_rows(k, n_rows, dense["packed"], xi + cat_offs)
    if spec.has_qr:
        c = spec.qr_collisions
        q, r = tables["q"], tables["r"]
        eq, er = q["edim"].shape[0], r["edim"].shape[0]
        kq, kr = q["packed"].shape[1] // eq, r["packed"].shape[1] // er
        q_offs = jnp.asarray(spec.q_offsets[num:], xi.dtype)[None, :]
        r_offs = jnp.asarray(spec.r_offsets[num:], xi.dtype)[None, :]
        q_emb = packed_take_rows(kq, max(spec.q_rows, 1), q["packed"],
                                 q_offs + xi // c)
        r_emb = packed_take_rows(kr, max(spec.r_rows, 1), r["packed"],
                                 r_offs + xi % c)
        if spec.qr_operation == "mult":
            qr_emb = q_emb * r_emb
        elif spec.qr_operation == "add":
            qr_emb = q_emb + r_emb
        else:
            qr_emb = jnp.concatenate([q_emb, r_emb], axis=-1)
        mask = jnp.asarray(spec.is_qr_field[num:])[None, :, None]
        out_cat = jnp.where(mask, qr_emb, out_cat)
    parts.append(out_cat.astype(xv.dtype))   # bf16 tables → compute dtype
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
