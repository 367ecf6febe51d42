"""Super-row packed table layout (ops/superpack.py): values and gradients must
match the unpacked packed_lookup exactly — the layout is a physical-memory
optimization, not a semantic change."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xsdeepfwfm_deprecated_tpu.ops import embedding as emb_ops
from xsdeepfwfm_deprecated_tpu.ops import superpack as sp

F_SIZES = [1, 1, 1, 5, 260, 700]   # 3 numeric + 3 categorical
NUM = 3
B = 24
E = 10


@pytest.fixture(scope="module")
def data(rng):
    xi = np.stack([rng.integers(-3, int(1.5 * n), size=B)
                   for n in F_SIZES[NUM:]], axis=1).astype(np.int32)
    xv = rng.normal(size=(B, NUM)).astype(np.float32)
    return jnp.asarray(xi), jnp.asarray(xv)


def test_pack_unpack_roundtrip(rng):
    t = jnp.asarray(rng.normal(size=(967, E)).astype(np.float32))
    packed = sp.pack_table(t)
    assert packed["packed"].shape == (-(-967 // 12), 12 * E)
    assert packed["edim"].shape == (E, 0)
    np.testing.assert_array_equal(np.asarray(sp.unpack_table(packed, 967)),
                                  np.asarray(t))


def test_pack_unpack_narrow_and_wide(rng):
    # E=1 packs 128 rows/line; E>=128 packs identity
    t1 = jnp.asarray(rng.normal(size=(300, 1)).astype(np.float32))
    p1 = sp.pack_table(t1)
    assert p1["packed"].shape == (3, 128)
    np.testing.assert_array_equal(np.asarray(sp.unpack_table(p1, 300)),
                                  np.asarray(t1))
    tw = jnp.asarray(rng.normal(size=(17, 200)).astype(np.float32))
    pw = sp.pack_table(tw)
    assert pw["packed"].shape == (17, 200)
    np.testing.assert_array_equal(np.asarray(sp.unpack_table(pw, 17)),
                                  np.asarray(tw))


@pytest.mark.parametrize("qr", [False, True])
def test_super_lookup_matches_packed_lookup(data, qr):
    xi, xv = data
    spec = emb_ops.make_spec(F_SIZES, NUM, qr_flag=qr, qr_collisions=4,
                             qr_threshold=200)
    tables = emb_ops.init_tables(jax.random.PRNGKey(0), spec, E)
    packed = sp.pack_params({"emb2": tables}, spec)["emb2"]
    want = emb_ops.packed_lookup(tables, spec, xi, xv)
    got = sp.super_lookup(packed, spec, xi, xv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    # handed unpacked tables, super_lookup falls through to packed_lookup
    got2 = sp.super_lookup(tables, spec, xi, xv)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want), rtol=1e-6)


def test_super_lookup_gradients_match(data, rng):
    """Cotangents scattered through the super-row layout must equal the
    unpacked scatter (compared after unpacking the packed gradient)."""
    xi, xv = data
    spec = emb_ops.make_spec(F_SIZES, NUM)
    tables = emb_ops.init_tables(jax.random.PRNGKey(1), spec, E)
    w = jnp.asarray(rng.normal(size=(B, len(F_SIZES), E)).astype(np.float32))

    g_plain = jax.grad(lambda t: jnp.sum(
        emb_ops.packed_lookup({"dense": t}, spec, xi, xv) * w))(tables["dense"])

    packed = sp.pack_table(tables["dense"])
    g_packed = jax.grad(lambda p: jnp.sum(sp.super_lookup(
        {"dense": {"packed": p, "edim": packed["edim"]}}, spec, xi, xv) * w))(
        packed["packed"])
    g_unpacked = sp.unpack_table({"packed": g_packed, "edim": packed["edim"]},
                                 spec.dense_rows)
    np.testing.assert_allclose(np.asarray(g_unpacked), np.asarray(g_plain),
                               rtol=1e-5, atol=1e-6)
    # padding rows of the last super-row receive zero gradient
    tail = np.asarray(g_packed).reshape(-1, E)[spec.dense_rows:]
    np.testing.assert_array_equal(tail, np.zeros_like(tail))


def test_packed_take_rows_windowed(rng):
    """Multi-window fast-path gathers on the packed operand (forced by
    shrinking the knee) still match."""
    orig = emb_ops.FAST_GATHER_BYTES
    try:
        emb_ops.FAST_GATHER_BYTES = 256   # 64-row f32 windows
        t = jnp.asarray(rng.normal(size=(3000, E)).astype(np.float32))
        packed = sp.pack_table(t)
        idx = jnp.asarray(rng.integers(-10, 3015, size=(57,)).astype(np.int32))
        got = sp.packed_take_rows(12, 3000, packed["packed"], idx)
        want = jnp.take(t, jnp.clip(idx, 0, 2999), axis=0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)
    finally:
        emb_ops.FAST_GATHER_BYTES = orig


def test_pack_params_tree_roundtrip():
    """pack_params/unpack_params traverse a full params pytree (and
    params-shaped optimizer-state subtrees) leaving non-table leaves alone."""
    spec = emb_ops.make_spec(F_SIZES, NUM)
    key = jax.random.PRNGKey(2)
    params = {
        "emb1": emb_ops.init_tables(key, spec, 1),
        "emb2": emb_ops.init_tables(key, spec, E),
        "field_cov": jnp.ones((6, 6)),
        "deep": {"net_1": {"layers": [{"w": jnp.ones((4, 4)),
                                       "b": jnp.zeros(4)}],
                           "fc_w": jnp.ones((4, 1))}},
    }
    packed = sp.pack_params(params, spec)
    assert sp.params_are_packed(packed)
    assert not sp.params_are_packed(params)
    assert packed["emb1"]["dense"]["packed"].shape[1] == 128
    assert packed["field_cov"].shape == (6, 6)
    restored = sp.unpack_params(packed, spec)
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bf16_table_dtype_train_checkpoint_roundtrip(rng, tmp_path):
    """-table_dtype bf16: tables+moments in bf16, f32 compute, checkpoint
    round-trips through the f32-widened npz, resume works."""
    from xsdeepfwfm_deprecated_tpu.config import ModelConfig, TrainConfig
    from xsdeepfwfm_deprecated_tpu.train.trainer import DeepFMEstimator

    mcfg = ModelConfig(field_size=6, feature_sizes=(1, 1, 1, 40, 56, 300),
                       numerical=3, embedding_size=10, use_fwfm=True,
                       use_deep=True, use_lw=True, use_fwlw=True,
                       deep_nodes=16, table_dtype="bf16")
    xi = rng.integers(0, [40, 56, 300], size=(512, 3)).astype(np.int32)
    xv = rng.normal(size=(512, 3)).astype(np.float32)
    y = (rng.random(512) < 0.3).astype(np.float32)
    est = DeepFMEstimator(mcfg, TrainConfig(n_epochs=1, batch_size=128,
                                            random_seed=7))
    est.fit(xi, xv, y)
    assert est.params["emb2"]["dense"].dtype == jnp.bfloat16
    assert np.asarray(est.predict_proba(xi[:8], xv[:8])).dtype == np.float64

    path = str(tmp_path / "bf16_ck")
    est.save(path)
    est2 = DeepFMEstimator(mcfg, TrainConfig(random_seed=7))
    est2.load(path)
    assert est2.params["emb2"]["dense"].dtype == jnp.bfloat16
    np.testing.assert_allclose(est2.predict_proba(xi[:64], xv[:64]),
                               est.predict_proba(xi[:64], xv[:64]), rtol=1e-5)
    est3 = DeepFMEstimator(mcfg, TrainConfig(n_epochs=2, batch_size=128,
                                             random_seed=7))
    est3.fit(xi, xv, y, resume_from=path)   # resume through bf16 opt state
