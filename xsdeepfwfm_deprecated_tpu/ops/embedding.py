"""Packed embedding tables: one fused gather instead of per-field loops.

The reference does 39 sequential Python-loop lookups over per-field
``nn.Embedding`` modules (``model/DeepFMs.py:302-335``; its own comments record
47% + 43% of forward time there). TPU-native design: all per-field tables are
packed into a single ``(sum(feature_sizes), E)`` array with static per-field
row offsets, so the whole lookup is ONE XLA gather of shape ``(B, F)`` →
``(B, F, E)``, fused with the numeric-value scaling.

Numeric-field semantics match the reference exactly: a numeric field has a
single embedding row (feature_size 1) that is scaled by the raw value
(``model/DeepFMs.py:302-304,334-335`` — row 0 of the size-1 table × Xv).

QR (quotient-remainder) compositional embeddings (reference
``model/QREmbeddingBag.py:156-174`` + ``create_emb`` ``model/DeepFMs.py:1066-1091``)
are folded into the same design: fields whose cardinality exceeds
``qr_threshold`` get rows in packed quotient/remainder tables instead of the
dense table; a static per-field mask selects which path feeds the output.
"""

from __future__ import annotations

import dataclasses
import functools
from dataclasses import dataclass
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class PackedEmbeddingSpec:
    """Static layout of a packed (possibly QR-composed) embedding table set."""

    feature_sizes: Tuple[int, ...]
    numerical: int
    qr_flag: bool = False
    qr_collisions: int = 4
    qr_threshold: int = 200
    qr_operation: str = "mult"

    # Derived (filled by make_spec)
    dense_offsets: Tuple[int, ...] = ()
    dense_rows: int = 0
    q_offsets: Tuple[int, ...] = ()
    q_rows: int = 0
    r_offsets: Tuple[int, ...] = ()
    r_rows: int = 0
    is_qr_field: Tuple[bool, ...] = ()

    @property
    def field_size(self) -> int:
        return len(self.feature_sizes)

    @property
    def has_qr(self) -> bool:
        return any(self.is_qr_field)

    @property
    def total_rows(self) -> int:
        return self.dense_rows + self.q_rows + self.r_rows


def make_spec(feature_sizes: Sequence[int], numerical: int, *, qr_flag: bool = False,
              qr_collisions: int = 4, qr_threshold: int = 200,
              qr_operation: str = "mult") -> PackedEmbeddingSpec:
    """Compute packed offsets. A field uses QR iff ``qr_flag`` and its
    cardinality exceeds ``qr_threshold`` (reference ``create_emb``,
    ``model/DeepFMs.py:1071``)."""
    dense_offsets, q_offsets, r_offsets, is_qr = [], [], [], []
    d_off = q_off = r_off = 0
    for n in feature_sizes:
        use_qr = bool(qr_flag and n > qr_threshold)
        is_qr.append(use_qr)
        if use_qr:
            dense_offsets.append(0)       # unused for this field
            q_offsets.append(q_off)
            r_offsets.append(r_off)
            q_off += -(-n // qr_collisions)   # ceil(n / collisions)
            r_off += qr_collisions
        else:
            dense_offsets.append(d_off)
            q_offsets.append(0)
            r_offsets.append(0)
            d_off += n
    return PackedEmbeddingSpec(
        feature_sizes=tuple(int(n) for n in feature_sizes), numerical=numerical,
        qr_flag=qr_flag, qr_collisions=qr_collisions, qr_threshold=qr_threshold,
        qr_operation=qr_operation,
        dense_offsets=tuple(dense_offsets), dense_rows=d_off,
        q_offsets=tuple(q_offsets), q_rows=q_off,
        r_offsets=tuple(r_offsets), r_rows=r_off,
        is_qr_field=tuple(is_qr))


def init_tables(key: jax.Array, spec: PackedEmbeddingSpec, embedding_dim: int,
                scale: float = 1.0, dtype=jnp.float32) -> Dict[str, jax.Array]:
    """N(0,1)·scale init for every table (reference ``init_weights``:
    1st-order scale 1.0, 2nd-order scale 0.01, ``model/DeepFMs.py:479-481``;
    the uniform EmbeddingBag init is overwritten by init_weights in the
    reference, so normal init applies to dense and QR paths alike)."""
    kd, kq, kr = jax.random.split(key, 3)
    tables = {"dense": jax.random.normal(kd, (max(spec.dense_rows, 1), embedding_dim), dtype) * scale}
    if spec.has_qr:
        qd, rd = _qr_dims(spec, embedding_dim)
        tables["q"] = jax.random.normal(kq, (spec.q_rows, qd), dtype) * scale
        tables["r"] = jax.random.normal(kr, (spec.r_rows, rd), dtype) * scale
    return tables


def _qr_dims(spec: PackedEmbeddingSpec, embedding_dim: int) -> Tuple[int, int]:
    """Per-table dims for the QR combine.

    mult/add keep dim E per table (reference ``QREmbeddingBag:131-133``).
    concat in the reference doubles the output dim, which would shape-error in
    its own forward; here concat splits E between the two tables so the output
    stays E (documented deviation).
    """
    if spec.qr_operation == "concat":
        return embedding_dim // 2, embedding_dim - embedding_dim // 2
    return embedding_dim, embedding_dim


def build_indices(spec: PackedEmbeddingSpec, xi: jax.Array, xv: jax.Array
                  ) -> Tuple[jax.Array, jax.Array]:
    """(xi int32 (B, C), xv f32 (B, Nnum)) → (raw per-field index (B, F), scale (B, F)).

    Numeric fields use index 0 into their single-row slot with scale = value;
    categorical fields use the mapped index with scale = 1.
    """
    B = xi.shape[0]
    num = spec.numerical
    raw_num = jnp.zeros((B, num), dtype=xi.dtype)
    raw = jnp.concatenate([raw_num, xi], axis=1)
    scale = jnp.concatenate([xv, jnp.ones((B, spec.field_size - num), dtype=xv.dtype)], axis=1)
    return raw, scale


def packed_lookup(tables: Dict[str, jax.Array], spec: PackedEmbeddingSpec,
                  xi: jax.Array, xv: jax.Array) -> jax.Array:
    """Fused lookup: → (B, F, E) field-embedding tensor, values pre-scaled.

    One routed gather for the dense path (+ two small gathers for QR fields
    when enabled), replacing the reference's per-field Python loops.
    """
    raw, scale = build_indices(spec, xi, xv)
    dense_emb = _dense_gather(tables["dense"], spec, raw)
    if spec.has_qr:
        qr_emb = _qr_gather(tables, spec, raw)
        mask = jnp.asarray(spec.is_qr_field)[None, :, None]
        emb = jnp.where(mask, qr_emb, dense_emb)
    else:
        emb = dense_emb
    # the value-scale multiply also upcasts bf16-stored tables to the compute
    # dtype (f32 xv); gradients cast back to the table dtype in the bwd rule
    return emb * scale[..., None]


# XLA's TPU gather emitter switches to a slower per-row strategy once the
# (static) operand exceeds ~512 KiB per lane column — i.e. rows × itemsize >
# 2**19 (measured on v5e: the knee sits between 131072 and 262144 rows for
# f32, between 262144 and beyond for bf16, ≥524288 rows still fast for int8).
# Inside a ``lax.scan`` body (the training dispatch) the slow path costs
# ~20 ns/row vs ~1.5 ns/row fast, so routing each field's indices to a
# within-knee static slice of the packed table wins ~2-3×; a field whose rows
# straddle a slice boundary is gathered from both slices and combined by
# validity mask. OUTSIDE a scan the same emitter runs ~4× faster and the
# per-gather-op overhead dominates instead — serving uses
# ``packed_lookup_serving`` (one gather + static numeric rows) for that
# regime. All thresholds re-measured in round 3 with D2H-forced timing.
FAST_GATHER_BYTES = 2 ** 19


def _fast_rows(dtype) -> int:
    return max(FAST_GATHER_BYTES // jnp.dtype(dtype).itemsize, 1)


def _clip_per_field(raw: jax.Array, sizes) -> jax.Array:
    """Clip each field's raw index into ``[0, sizes[f]-1]``.

    Out-of-range indices are invalid input (the reference would either pick an
    arbitrary row or crash, ``nn.Embedding`` semantics); here EVERY lookup
    regime — naive, routed-window forward, and the scatter-add backward —
    applies this same per-field clip, so an out-of-range index consistently
    resolves to its field's LAST row in forward and backward alike (round-3
    behavior depended on batch size via the routed/naive dispatch; advisor
    finding r3).
    """
    hi = jnp.asarray([max(int(n) - 1, 0) for n in sizes], raw.dtype)[None, :]
    return jnp.clip(raw, 0, hi)


def _field_route_plan(offsets, sizes, total_rows, shard_rows):
    """Static routing plan: [(row_start, row_end, [(field, all_valid), ...])].

    Slices are consecutive ``shard_rows`` windows of the packed table; field
    ``f`` (rows ``[offsets[f], offsets[f]+sizes[f])``) is routed to every
    window it intersects. ``all_valid`` marks fields wholly inside a window
    (no mask needed).
    """
    plan = []
    for start in range(0, total_rows, shard_rows):
        end = min(start + shard_rows, total_rows)
        fields = []
        for f, (o, n) in enumerate(zip(offsets, sizes)):
            if n <= 1:
                continue  # single-row fields are sliced statically
            if o < end and o + n > start:
                fields.append((f, o >= start and o + n <= end))
        if fields:
            plan.append((start, end, fields))
    return plan


def _routed_gather(table: jax.Array, offsets, sizes, raw: jax.Array,
                   shard_rows: int = 0) -> jax.Array:
    """Gather ``out[:, f] = table[offsets[f] + raw[:, f]]`` via the fast-path
    routing plan above. Single-row fields (numeric slots) never gather: their
    row is a static slice broadcast over the batch. ``shard_rows`` overrides
    the dtype-derived window size (tests). Indices are clipped per field
    (see :func:`_clip_per_field`), so every index lands in one of its field's
    windows — routed and naive forwards agree on any input.
    """
    B, F = raw.shape
    E = table.shape[1]
    raw = _clip_per_field(raw, sizes)
    per_field = [None] * F

    for f, (o, n) in enumerate(zip(offsets, sizes)):
        if n <= 1:
            row = jax.lax.slice_in_dim(table, o, o + 1, axis=0)       # (1, E)
            per_field[f] = jnp.broadcast_to(row, (B, E))

    for start, end, fields in _field_route_plan(
            offsets, sizes, table.shape[0],
            shard_rows or _fast_rows(table.dtype)):
        window = jax.lax.slice_in_dim(table, start, end, axis=0)
        offs = jnp.asarray([offsets[f] - start for f, _ in fields],
                           dtype=raw.dtype)[None, :]
        cols = raw[:, [f for f, _ in fields]]
        local = jnp.clip(cols + offs, 0, end - start - 1)
        got = jnp.take(window, local, axis=0)                         # (B, k, E)
        for j, (f, all_valid) in enumerate(fields):
            piece = got[:, j]
            if not all_valid:
                g = offsets[f] + cols[:, j]
                valid = (g >= start) & (g < end)
                piece = jnp.where(valid[:, None], piece, 0)
            per_field[f] = piece if per_field[f] is None else per_field[f] + piece

    return jnp.stack(per_field, axis=1)                               # (B, F, E)


# Below this many gathered rows (static: batch × multi-row fields) the
# single-gather forward beats the routed one inside a scan body. Round-3
# measured the crossover between B=4096 (106K rows, naive wins) and B=8192
# (213K rows, routed wins) and set 200_000; the round-4 recalibration
# (scripts/recalibrate_cost_model.py, RECALIBRATE_r4.json) found routed
# already winning at 106K rows (naive 4.24 ms vs routed 2.91 ms in-scan) —
# constant updated to the measured crossover. NOTE: this dispatch only
# governs the FLAT (N, E) layout (mesh-sharded paths); the single-device
# product path uses the super-row layout (ops/superpack.py), whose packed
# operand sits under the fast-path knee and needs no routing at all.
ROUTED_FWD_MIN_ROWS = 106_000


def _leading_single(sizes) -> int:
    """#leading single-row fields (the numeric block in every dataset here)."""
    k = 0
    for n in sizes:
        if n > 1:
            break
        k += 1
    return k


def _field_gather_impl(offsets, sizes, table, raw):
    B = raw.shape[0]
    raw = _clip_per_field(raw, sizes)
    num = _leading_single(sizes)
    multi = [f for f, n in enumerate(sizes) if n > 1]
    if B * len(multi) >= ROUTED_FWD_MIN_ROWS:
        return _routed_gather(table, offsets, sizes, raw)
    E = table.shape[1]
    if num == len(sizes) - len(multi) and multi == list(range(num, len(sizes))):
        # common layout: numeric block first, all remaining fields multi-row.
        # ONE block slice + ONE take + ONE concat (a 39-way stack of (B, E)
        # pieces costs ~40 MB of lane-padded copies per scan step; avoid it).
        parts = []
        if num:
            block = jax.lax.slice_in_dim(table, offsets[0], offsets[0] + num, axis=0)
            parts.append(jnp.broadcast_to(block[None], (B, num, E)))
        offs = jnp.asarray([offsets[f] for f in multi], raw.dtype)[None, :]
        idx = jnp.clip(raw[:, num:] + offs, 0, table.shape[0] - 1)
        parts.append(jnp.take(table, idx, axis=0))
        return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    per = [None] * len(sizes)
    for f, (o, n) in enumerate(zip(offsets, sizes)):
        if n <= 1:
            row = jax.lax.slice_in_dim(table, o, o + 1, axis=0)
            per[f] = jnp.broadcast_to(row, (B, E))
    if multi:
        offs = jnp.asarray([offsets[f] for f in multi], raw.dtype)[None, :]
        idx = jnp.clip(raw[:, multi] + offs, 0, table.shape[0] - 1)
        got = jnp.take(table, idx, axis=0)
        for j, f in enumerate(multi):
            per[f] = got[:, j]
    return jnp.stack(per, axis=1)


def _windowed_scatter_add(n_rows, idx_flat, upd_flat):
    """grad_table (n_rows, E): scatter-add in ≤fast-path windows + concat.

    The TPU scatter emitter has the same large-operand cliff as gather; a
    windowed scatter into ≤2**19-byte-per-lane slices concatenated back is
    exact (windows partition the rows). Round 3 measured it 2× faster than
    one big scatter at full-Criteo scale (4.8 → 2.4 ms for 53K updates,
    in-scan); the round-4 recalibration measured the OPPOSITE on the same
    chip (single 3.46 ms vs windowed 8.97 ms — RECALIBRATE_r4.json), i.e.
    the emitter's scatter cliff moved across an XLA update. The product path
    no longer cares: the super-row layout's scatter operand (ops/superpack.py)
    sits under the fast-path knee, where this function does a single
    scatter-add anyway (0.52 ms measured). The windowed branch remains for
    flat-layout operands past the knee (mesh-sharded tables).
    """
    W = _fast_rows(upd_flat.dtype)
    if n_rows <= W:
        z = jnp.zeros((n_rows, upd_flat.shape[1]), upd_flat.dtype)
        return z.at[idx_flat].add(upd_flat)
    outs = []
    for s in range(0, n_rows, W):
        e = min(s + W, n_rows)
        z = jnp.zeros((e - s, upd_flat.shape[1]), upd_flat.dtype)
        valid = (idx_flat >= s) & (idx_flat < e)
        loc = jnp.clip(idx_flat - s, 0, e - s - 1)
        outs.append(z.at[loc].add(jnp.where(valid[:, None], upd_flat, 0)))
    return jnp.concatenate(outs, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _field_gather(offsets, sizes, table, raw):
    """out[:, f] = table[clip(offsets[f] + raw[:, f])], (B, F) → (B, F, E).

    custom_vjp so the forward can pick the regime-appropriate gather form
    (single-row static slices + one take, or the routed windows at large
    batch) while the backward always uses the windowed scatter-add — the
    autodiff backward of the routed forward would materialize one zero-padded
    full-table gradient per window (11 × 53 MB at full-Criteo).
    """
    return _field_gather_impl(offsets, sizes, table, raw)


def _field_gather_fwd(offsets, sizes, table, raw):
    out = _field_gather_impl(offsets, sizes, table, raw)
    # (0, E) slice carries the table's static shape[0]/dtype into the bwd rule
    return out, (table.shape[0], jax.lax.slice_in_dim(table, 0, 0, axis=0), raw)


def _field_gather_bwd(offsets, sizes, res, g):
    n_rows, proto, raw = res
    g = g.astype(proto.dtype)
    raw = _clip_per_field(raw, sizes)   # same clip as every forward regime
    single = [f for f, n in enumerate(sizes) if n <= 1]
    multi = [f for f, n in enumerate(sizes) if n > 1]
    offs = jnp.asarray([offsets[f] for f in multi], raw.dtype)[None, :]
    idx = jnp.clip(raw[:, multi] + offs, 0, n_rows - 1).reshape(-1)
    upd = g[:, multi].reshape(-1, g.shape[-1])
    if single:
        # single-row fields: the row gradient is the batch-sum of its
        # cotangents at a STATIC row — appended as a handful of extra scatter
        # updates instead of B×num ones (or a second big-operand scatter op).
        rows = jnp.asarray([offsets[f] for f in single], idx.dtype)
        idx = jnp.concatenate([idx, rows])
        upd = jnp.concatenate([upd, jnp.sum(g[:, single], axis=0)])
    grad_table = _windowed_scatter_add(n_rows, idx, upd)
    return grad_table, np.zeros(raw.shape, dtype=jax.dtypes.float0)


_field_gather.defvjp(_field_gather_fwd, _field_gather_bwd)


@jax.custom_vjp
def fast_take_rows(table, idx):
    """``table[clip(idx)]`` for ARBITRARY (unrouted) indices with the same
    fast-path treatment as the field-routed gather: the forward sums
    validity-masked takes over ≤fast-path-sized static windows when the
    operand exceeds the emitter's knee, and the backward is the windowed
    scatter-add. Used by the shard_map local lookups
    (:mod:`...parallel.embedding_sharding`), whose per-chip table shards
    (e.g. 1.33M/8 ≈ 166K rows at full-Criteo) sit past the knee but whose
    shard-relative indices have no static per-field structure to route by.
    """
    return _fast_take_impl(table, idx)


def _fast_take_impl(table, idx):
    n, W = table.shape[0], _fast_rows(table.dtype)
    cidx = jnp.clip(idx, 0, n - 1)
    if n <= W:
        return jnp.take(table, cidx, axis=0)
    out = None
    for s in range(0, n, W):
        e = min(s + W, n)
        window = jax.lax.slice_in_dim(table, s, e, axis=0)
        local = jnp.clip(cidx - s, 0, e - s - 1)
        got = jnp.take(window, local, axis=0)
        valid = (cidx >= s) & (cidx < e)
        got = jnp.where(valid[..., None], got, 0)
        out = got if out is None else out + got
    return out


def _fast_take_fwd(table, idx):
    return _fast_take_impl(table, idx), (
        table.shape[0], jax.lax.slice_in_dim(table, 0, 0, axis=0), idx)


def _fast_take_bwd(res, g):
    n_rows, proto, idx = res
    flat_idx = jnp.clip(idx, 0, n_rows - 1).reshape(-1)
    upd = g.reshape(-1, g.shape[-1]).astype(proto.dtype)
    return _windowed_scatter_add(n_rows, flat_idx, upd), \
        np.zeros(idx.shape, dtype=jax.dtypes.float0)


fast_take_rows.defvjp(_fast_take_fwd, _fast_take_bwd)


def _dense_gather(table: jax.Array, spec: PackedEmbeddingSpec, raw: jax.Array) -> jax.Array:
    # QR fields have no rows here (dense_offsets 0, unused): give them a
    # trivial single-row route; packed_lookup's where() discards the value
    # (and zeroes its cotangent, so the backward scatter adds zeros there).
    sizes = tuple(1 if qr else n
                  for n, qr in zip(spec.feature_sizes, spec.is_qr_field))
    return _field_gather(spec.dense_offsets, sizes, table, raw)


def packed_lookup_serving(tables: Dict[str, jax.Array], spec: PackedEmbeddingSpec,
                          xi: jax.Array, xv: jax.Array) -> jax.Array:
    """Out-of-``lax.scan`` lookup for the serving path: → (B, F, E).

    Numeric fields read their single row with a STATIC slice (no gather at
    all — the reference gathers row 0 of a size-1 nn.Embedding per numeric
    field, ``model/DeepFMs.py:302-304``); the categorical fields use ONE
    clipped gather over the whole packed table. Outside a scan the gather
    emitter's per-op overhead dominates (measured ~1.3 ms for this form vs
    ~2.3 ms for the 11-window routed form at batch 8192×39 on v5e), which
    inverts the routed-vs-naive tradeoff that holds inside the training scan.
    Semantics identical to :func:`packed_lookup`.
    """
    num = spec.numerical
    assert all(n == 1 for n in spec.feature_sizes[:num]), \
        "numeric fields must be leading single-row slots"
    dense = tables["dense"]
    B = xi.shape[0]
    # per-field clip: identical out-of-range semantics to packed_lookup
    xi = _clip_per_field(xi, spec.feature_sizes[num:])
    parts = []
    if num:
        nrow = jax.lax.slice_in_dim(dense, 0, num, axis=0)        # (num, E)
        parts.append(xv[..., None] * nrow[None])                  # (B, num, E)
    cat_offs = jnp.asarray(spec.dense_offsets[num:], xi.dtype)[None, :]
    idx = jnp.clip(xi + cat_offs, 0, dense.shape[0] - 1)
    out_cat = jnp.take(dense, idx, axis=0)                        # (B, C, E)
    if spec.has_qr:
        c = spec.qr_collisions
        q_offs = jnp.asarray(spec.q_offsets[num:], xi.dtype)[None, :]
        r_offs = jnp.asarray(spec.r_offsets[num:], xi.dtype)[None, :]
        q_emb = jnp.take(tables["q"],
                         jnp.clip(q_offs + xi // c, 0, tables["q"].shape[0] - 1), axis=0)
        r_emb = jnp.take(tables["r"],
                         jnp.clip(r_offs + xi % c, 0, tables["r"].shape[0] - 1), axis=0)
        if spec.qr_operation == "mult":
            qr = q_emb * r_emb
        elif spec.qr_operation == "add":
            qr = q_emb + r_emb
        else:
            qr = jnp.concatenate([q_emb, r_emb], axis=-1)
        mask = jnp.asarray(spec.is_qr_field[num:])[None, :, None]
        out_cat = jnp.where(mask, qr, out_cat)
    parts.append(out_cat.astype(xv.dtype))   # bf16 tables → compute dtype
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]


# Serving-gather field grouping (round 5). The gather fast path's knee sits
# at ~1 MB of PER-LANE-COLUMN bytes (rows × itemsize) regardless of dtype
# (measured, scripts/reconcile_int8_gather.py): below it rows fetch at
# ~1.4-1.9 ns, above at ~4.1-4.9 ns. Serving indices are per-field, so the
# packed table splits into contiguous FIELD GROUPS each under the knee with
# no routing or masking. Measured optimum cap 0.45 MB
# (scripts/measure_grouped_gather.py: f32 0.796 → 0.583 ms per 8192×26
# lookup, int8 1.077 → 0.340 ms — 3.2×).
SERVING_GROUP_LANE_BYTES = 450_000


def serving_field_groups(spec: PackedEmbeddingSpec, itemsize: int,
                         cap_bytes: int = None):
    """Greedy contiguous categorical-field groups whose packed-row spans hold
    ≤ ``cap_bytes`` per lane column (a single larger-than-cap field gets its
    own group; default cap = module ``SERVING_GROUP_LANE_BYTES``, resolved at
    call time so tests can force multi-group splits on tiny tables). Returns
    ``[(f_lo, f_hi, row_lo, row_hi), ...]`` with field indices relative to
    the categorical block and rows into the packed dense table. Non-QR specs
    only (QR fields have no dense rows to split)."""
    if cap_bytes is None:
        cap_bytes = SERVING_GROUP_LANE_BYTES
    assert not spec.has_qr, "grouped serving layout supports non-QR specs"
    num = spec.numerical
    sizes = spec.feature_sizes[num:]
    offs = spec.dense_offsets[num:]
    groups, start, acc = [], 0, 0
    for f, s in enumerate(sizes):
        if acc and (acc + s) * itemsize > cap_bytes:
            groups.append((start, f, offs[start], offs[start] + acc))
            start, acc = f, 0
        acc += s
    groups.append((start, len(sizes), offs[start], offs[start] + acc))
    return groups


def split_serving_tables(tables: Dict[str, jax.Array],
                         spec: PackedEmbeddingSpec) -> Dict[str, jax.Array]:
    """Pre-split a serving tables dict into the GROUPED layout:
    ``{'dense_num': (num, E), 'dense_groups': ((rows_g, E), ...)}`` — one
    device buffer per group so every gather's operand sits under the knee.
    (Splitting inside jit would make XLA re-slice the 53 MB table per call;
    the Predictor splits once at construction.)"""
    dense = tables["dense"]
    groups = serving_field_groups(spec, dense.dtype.itemsize)
    return {"dense_num": dense[:spec.numerical],
            "dense_groups": tuple(dense[rlo:rhi] for _, _, rlo, rhi in groups)}


def grouped_lookup_serving(tables: Dict[str, jax.Array],
                           spec: PackedEmbeddingSpec,
                           xi: jax.Array, xv: jax.Array) -> jax.Array:
    """:func:`packed_lookup_serving` on the grouped layout — identical
    semantics (same per-field clip, same numeric static rows), G sub-knee
    gathers instead of one over-knee gather. 1.37× (f32) / 3.2× (int8) on
    the full-Criteo lookup, measured (RESULTS.md round 5)."""
    num = spec.numerical
    assert all(n == 1 for n in spec.feature_sizes[:num]), \
        "numeric fields must be leading single-row slots"
    subs = tables["dense_groups"]
    groups = serving_field_groups(spec, subs[0].dtype.itemsize)
    xi = _clip_per_field(xi, spec.feature_sizes[num:])
    parts = []
    if num:
        parts.append(xv[..., None] * tables["dense_num"][None])
    outs = []
    for (flo, fhi, rlo, rhi), sub in zip(groups, subs):
        local_offs = jnp.asarray(
            [o - rlo for o in spec.dense_offsets[num + flo:num + fhi]],
            xi.dtype)[None, :]
        idx = jnp.clip(xi[:, flo:fhi] + local_offs, 0, sub.shape[0] - 1)
        outs.append(jnp.take(sub, idx, axis=0))
    parts.append(jnp.concatenate(outs, axis=1).astype(xv.dtype))
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]


def _qr_gather(tables: Dict[str, jax.Array], spec: PackedEmbeddingSpec,
               raw: jax.Array) -> jax.Array:
    """Quotient/remainder split + combine (reference ``QREmbeddingBag:156-174``).

    Indices clip per field BEFORE the q/r split, so an out-of-range index
    resolves to the last row's (q, r) pair — consistent with the dense path's
    per-field clip (:func:`_clip_per_field`)."""
    c = spec.qr_collisions
    raw = _clip_per_field(raw, spec.feature_sizes)
    q_sizes = tuple(-(-n // c) if qr else 1
                    for n, qr in zip(spec.feature_sizes, spec.is_qr_field))
    r_sizes = tuple(c if qr else 1 for qr in spec.is_qr_field)
    q_emb = _field_gather(spec.q_offsets, q_sizes, tables["q"], raw // c)
    r_emb = _field_gather(spec.r_offsets, r_sizes, tables["r"], raw % c)
    if spec.qr_operation == "mult":
        return q_emb * r_emb
    if spec.qr_operation == "add":
        return q_emb + r_emb
    return jnp.concatenate([q_emb, r_emb], axis=-1)  # concat (split-E variant)


def table_param_count(tables: Dict[str, jax.Array]) -> int:
    return int(sum(np.prod(t.shape) for t in tables.values()))
