"""Op-level math tests: packed lookup, interactions, MLP — each verified
against a naive per-field numpy implementation mirroring the reference's
loops (``model/DeepFMs.py:285-469``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xsdeepfwfm_deprecated_tpu.ops import embedding as emb_ops
from xsdeepfwfm_deprecated_tpu.ops import interactions as inter_ops
from xsdeepfwfm_deprecated_tpu.ops import mlp as mlp_ops

F_SIZES = [1, 1, 4, 7, 300]   # 2 numeric + 3 categorical (one > qr_threshold 200)
NUM = 2
B = 16
E = 6


@pytest.fixture(scope="module")
def batch(rng):
    xi = rng.integers(0, [4, 7, 300], size=(B, 3)).astype(np.int32)
    xv = rng.normal(size=(B, NUM)).astype(np.float32)
    return xi, xv


def naive_lookup(table_list, xi, xv):
    """Reference semantics: numeric field f → row0 · value; categorical → lookup."""
    out = np.zeros((B, len(F_SIZES), table_list[0].shape[1]), np.float32)
    for f in range(len(F_SIZES)):
        if f < NUM:
            out[:, f] = table_list[f][0][None, :] * xv[:, f][:, None]
        else:
            out[:, f] = table_list[f][xi[:, f - NUM]]
    return out


def split_tables(packed, spec):
    return [np.asarray(packed[spec.dense_offsets[f]:spec.dense_offsets[f] + F_SIZES[f]])
            for f in range(len(F_SIZES))]


def test_packed_lookup_matches_per_field(batch):
    xi, xv = batch
    spec = emb_ops.make_spec(F_SIZES, NUM)
    tables = emb_ops.init_tables(jax.random.PRNGKey(0), spec, E)
    got = np.asarray(emb_ops.packed_lookup(tables, spec, jnp.asarray(xi), jnp.asarray(xv)))
    want = naive_lookup(split_tables(np.asarray(tables["dense"]), spec), xi, xv)
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.parametrize("op", ["mult", "add", "concat"])
def test_qr_lookup(batch, op):
    xi, xv = batch
    spec = emb_ops.make_spec(F_SIZES, NUM, qr_flag=True, qr_collisions=4,
                             qr_threshold=200, qr_operation=op)
    assert spec.is_qr_field == (False, False, False, False, True)
    assert spec.q_rows == 75 and spec.r_rows == 4
    tables = emb_ops.init_tables(jax.random.PRNGKey(1), spec, E)
    got = np.asarray(emb_ops.packed_lookup(tables, spec, jnp.asarray(xi), jnp.asarray(xv)))
    # non-QR fields follow the dense path
    dense = np.asarray(tables["dense"])
    for f in range(4):
        if f < NUM:
            want = dense[spec.dense_offsets[f]][None, :] * xv[:, f][:, None]
        else:
            want = dense[spec.dense_offsets[f] + xi[:, f - NUM]]
        np.testing.assert_allclose(got[:, f], want, rtol=1e-6)
    # QR field: quotient/remainder combine (reference QREmbeddingBag:156-174)
    q, r = np.asarray(tables["q"]), np.asarray(tables["r"])
    idx = xi[:, 2]
    eq, er = q[idx // 4], r[idx % 4]
    want_qr = {"mult": eq * er, "add": eq + er,
               "concat": np.concatenate([eq, er], -1)}[op]
    np.testing.assert_allclose(got[:, 4], want_qr, rtol=1e-6)


def naive_fwfm(embn, r_sym):
    """Direct port of the reference einsum chain (model/DeepFMs.py:352-367)."""
    outer = np.einsum("bke,ble->klbe", embn, embn)
    outer_w = np.einsum("klbe,kl->klbe", outer, r_sym)
    return 0.5 * (outer_w.sum((0, 1)) - np.einsum("kkbe->be", outer_w))


def test_fwfm_second_order_matches_naive(rng):
    embn = rng.normal(size=(B, 5, E)).astype(np.float32)
    r = rng.normal(size=(5, 5)).astype(np.float32)
    got = np.asarray(inter_ops.fwfm_second_order(jnp.asarray(embn), jnp.asarray(r)))
    want = naive_fwfm(embn, 0.5 * (r + r.T))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)


def test_fm_second_order_matches_naive(rng):
    embn = rng.normal(size=(B, 5, E)).astype(np.float32)
    got = np.asarray(inter_ops.fm_second_order(jnp.asarray(embn)))
    outer = np.einsum("bke,ble->klbe", embn, embn)
    want = 0.5 * (outer.sum((0, 1)) - np.einsum("kkbe->be", outer))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)


def test_fwfm_linear_term(rng):
    embn = rng.normal(size=(B, 5, E)).astype(np.float32)
    w = rng.normal(size=(5, E)).astype(np.float32)
    got = np.asarray(inter_ops.fwfm_linear_term(jnp.asarray(embn), jnp.asarray(w)))
    # reference: einsum('ijk,ik->ijk') then 'ijk->ji' with i=field, j=batch
    want = np.einsum("fbe,fe->bf", embn.transpose(1, 0, 2), w)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)


def test_ffm_second_order(rng):
    f = 4
    pair = rng.normal(size=(B, f, f, E)).astype(np.float32)
    got = np.asarray(inter_ops.ffm_second_order(jnp.asarray(pair)))
    want = np.zeros((B, E), np.float32)
    for i in range(f):
        for j in range(i + 1, f):
            want += pair[:, i, j] * pair[:, j, i]
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)


def test_mlp_forward_eval(rng):
    net = mlp_ops.init_mlp(jax.random.PRNGKey(0), 12, [8, 8], head_scale=0.1)
    x = rng.normal(size=(B, 12)).astype(np.float32)
    out = np.asarray(mlp_ops.mlp_forward(net, jnp.asarray(x),
                                         dropout_rates=(0.5, 0.5, 0.5), train=False))
    # naive
    h = x
    for layer in net["layers"]:
        h = np.maximum(h @ np.asarray(layer["w"]) + np.asarray(layer["b"]), 0)
    want = h @ np.asarray(net["fc_w"])
    np.testing.assert_allclose(out, want, rtol=2e-5, atol=1e-5)
    assert out.shape == (B, 1)


def test_dropout_train_scales(rng):
    x = jnp.ones((1000, 100))
    out = mlp_ops.dropout(jax.random.PRNGKey(0), x, 0.5, train=True)
    kept = np.asarray(out) != 0
    assert abs(kept.mean() - 0.5) < 0.05
    np.testing.assert_allclose(np.asarray(out)[kept], 2.0, rtol=1e-6)
    # eval mode: identity
    np.testing.assert_array_equal(np.asarray(mlp_ops.dropout(None, x, 0.5, False)), 1.0)


@pytest.mark.parametrize("qr", [False, True])
def test_serving_lookup_matches_packed(batch, qr):
    """packed_lookup_serving (out-of-scan serving form: static numeric rows +
    one clipped gather) must be numerically identical to packed_lookup."""
    xi, xv = batch
    spec = emb_ops.make_spec(F_SIZES, NUM, qr_flag=qr, qr_collisions=4,
                             qr_threshold=200)
    tables = emb_ops.init_tables(jax.random.PRNGKey(2), spec, E)
    a = np.asarray(emb_ops.packed_lookup(tables, spec, jnp.asarray(xi), jnp.asarray(xv)))
    b = np.asarray(emb_ops.packed_lookup_serving(tables, spec, jnp.asarray(xi),
                                                 jnp.asarray(xv)))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_routed_gather_multiwindow_matches_single_take(rng):
    """Force multiple route windows (shard_rows < field sizes) and check the
    routed gather, including boundary-straddling fields, against one take."""
    sizes = (1, 700, 513, 1024, 3, 5000)
    offsets, off = [], 0
    for n in sizes:
        offsets.append(off)
        off += n
    table = jnp.asarray(rng.normal(size=(off, 4)).astype(np.float32))
    raw = jnp.asarray(np.stack(
        [rng.integers(0, n, size=64) for n in sizes], axis=1).astype(np.int32))
    plan = emb_ops._field_route_plan(offsets, sizes, off, shard_rows=512)
    assert len(plan) > 3  # genuinely multi-window
    got = emb_ops._routed_gather(table, tuple(offsets), sizes, raw,
                                 shard_rows=512)
    want = jnp.take(table, jnp.asarray(offsets)[None, :] + raw, axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_fast_take_rows_matches_take_and_grads(rng):
    """fast_take_rows (value-windowed custom-vjp gather for shard-local
    lookups) must equal clipped take in value and gradient, incl. multi-window
    operands and out-of-range indices."""
    orig = emb_ops.FAST_GATHER_BYTES
    try:
        emb_ops.FAST_GATHER_BYTES = 2048   # 512-row f32 windows
        table = jnp.asarray(rng.normal(size=(1700, 6)).astype(np.float32))
        idx = jnp.asarray(rng.integers(-5, 1710, size=(37, 4)).astype(np.int32))
        got = emb_ops.fast_take_rows(table, idx)
        want = jnp.take(table, jnp.clip(idx, 0, 1699), axis=0)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        w = jnp.asarray(rng.normal(size=(37, 4, 6)).astype(np.float32))
        g1 = jax.grad(lambda t: jnp.sum(emb_ops.fast_take_rows(t, idx) * w) ** 2)(table)
        g2 = jax.grad(lambda t: jnp.sum(
            jnp.take(t, jnp.clip(idx, 0, 1699), axis=0) * w) ** 2)(table)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5,
                                   atol=1e-5)
    finally:
        emb_ops.FAST_GATHER_BYTES = orig


def test_out_of_range_index_semantics_agree_across_regimes(rng):
    """Out-of-range indices clip PER FIELD (to the field's last row) in every
    lookup regime — naive, routed-window, serving — and in the custom-vjp
    backward (advisor r3: the routed forward used to zero such rows while the
    naive forward and the backward credited a clipped row)."""
    sizes = (1, 1, 700, 513, 3)
    num = 2
    spec = emb_ops.make_spec(sizes, num)
    table = jnp.asarray(rng.normal(size=(spec.dense_rows, 4)).astype(np.float32))
    tables = {"dense": table}
    # half the indices wildly out of range (negative and past the field size)
    xi = np.stack([rng.integers(-300, 2 * n, size=48) for n in sizes[num:]],
                  axis=1).astype(np.int32)
    xv = rng.normal(size=(48, num)).astype(np.float32)
    xi_j, xv_j = jnp.asarray(xi), jnp.asarray(xv)

    want = np.zeros((48, len(sizes), 4), np.float32)
    tl = [np.asarray(table[spec.dense_offsets[f]:spec.dense_offsets[f] + sizes[f]])
          for f in range(len(sizes))]
    for f in range(len(sizes)):
        if f < num:
            want[:, f] = tl[f][0][None] * xv[:, f][:, None]
        else:
            want[:, f] = tl[f][np.clip(xi[:, f - num], 0, sizes[f] - 1)]

    got_naive = emb_ops.packed_lookup(tables, spec, xi_j, xv_j)
    np.testing.assert_allclose(np.asarray(got_naive), want, rtol=1e-6)

    got_serving = emb_ops.packed_lookup_serving(tables, spec, xi_j, xv_j)
    np.testing.assert_allclose(np.asarray(got_serving), want, rtol=1e-6)

    raw, _ = emb_ops.build_indices(spec, xi_j, xv_j)
    got_routed = emb_ops._routed_gather(table, spec.dense_offsets,
                                        spec.feature_sizes, raw, shard_rows=512)
    # scale numeric rows to compare with the value-scaled naive output
    got_routed = np.array(got_routed)
    got_routed[:, :num] *= xv[..., None]
    np.testing.assert_allclose(got_routed, want, rtol=1e-6)

    # backward credits the SAME clipped rows the forward read
    w = jnp.asarray(rng.normal(size=(48, len(sizes), 4)).astype(np.float32))
    g_pack = jax.grad(lambda t: jnp.sum(
        emb_ops.packed_lookup({"dense": t}, spec, xi_j, xv_j) * w))(table)
    g_ref = np.zeros_like(np.asarray(table))
    scale = np.concatenate([xv, np.ones((48, len(sizes) - num), np.float32)], 1)
    wg = np.asarray(w) * scale[..., None]
    for f in range(len(sizes)):
        o = spec.dense_offsets[f]
        if f < num:
            g_ref[o] += wg[:, f].sum(0)
        else:
            for b in range(48):
                g_ref[o + np.clip(xi[b, f - num], 0, sizes[f] - 1)] += wg[b, f]
    np.testing.assert_allclose(np.asarray(g_pack), g_ref, rtol=1e-4, atol=1e-5)


def test_mlp_forward_3d_input_matches_flat(rng):
    """The 3-D first-layer contraction equals the flattened path exactly in
    eval mode (no dropout), with and without masks."""
    import jax
    net = mlp_ops.init_mlp(jax.random.PRNGKey(3), 6 * 5, [16, 16],
                           head_scale=0.1)
    x3 = jnp.asarray(rng.normal(size=(32, 6, 5)).astype(np.float32))
    rates = (0.0, 0.0, 0.0)
    flat = mlp_ops.mlp_forward(net, x3.reshape(32, -1), dropout_rates=rates)
    got = mlp_ops.mlp_forward(net, x3, dropout_rates=rates)
    np.testing.assert_allclose(np.asarray(got), np.asarray(flat),
                               rtol=1e-6, atol=1e-6)
    masks = {"layers": [jnp.asarray((rng.random((30, 16)) > 0.5),
                                    dtype=jnp.float32),
                        jnp.ones((16, 16))],
             "fc_w": jnp.ones((16, 1))}
    flat_m = mlp_ops.mlp_forward(net, x3.reshape(32, -1), dropout_rates=rates,
                                 masks=masks)
    got_m = mlp_ops.mlp_forward(net, x3, dropout_rates=rates, masks=masks)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(flat_m),
                               rtol=1e-6, atol=1e-6)
    # gradients agree too (the training path)
    g1 = jax.grad(lambda n: jnp.sum(mlp_ops.mlp_forward(
        n, x3, dropout_rates=rates) ** 2))(net)
    g2 = jax.grad(lambda n: jnp.sum(mlp_ops.mlp_forward(
        n, x3.reshape(32, -1), dropout_rates=rates) ** 2))(net)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
