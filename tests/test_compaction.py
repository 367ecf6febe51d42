"""Serve-time compaction of pruned models (VERDICT r2 #2).

Core contract: ``compact_forward(compact_for_serving(pruned_params), xi, xv)``
is logit-equal to ``deepfwfm.forward(pruned_params, ...)`` — for row-pruned
tables (remap gather), element-pruned towers, structured-pruned towers
(real shrinkage), constant-unit bias folding, and QR models.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xsdeepfwfm_deprecated_tpu.compression.pruning import prune_params
from xsdeepfwfm_deprecated_tpu.config import ModelConfig, TrainConfig
from xsdeepfwfm_deprecated_tpu.models import deepfwfm
from xsdeepfwfm_deprecated_tpu.serving.compaction import (CompactModel,
                                                          compact_for_serving,
                                                          compact_forward,
                                                          compaction_report)

F_SIZES = (1, 1, 300, 400, 250)
NUM = 2


def _case(rng, *, qr=False, b=64):
    cfg = ModelConfig(field_size=5, feature_sizes=F_SIZES, numerical=NUM,
                      embedding_size=8, h_depth=3, deep_nodes=32,
                      use_fwfm=True, use_deep=True, use_lw=True, use_fwlw=True,
                      qr_flag=qr, qr_threshold=260, qr_collisions=4)
    params = deepfwfm.init_params(jax.random.PRNGKey(0), cfg)
    xi = rng.integers(0, [300, 400, 250], size=(b, 3)).astype(np.int32)
    xv = rng.normal(size=(b, NUM)).astype(np.float32)
    return cfg, params, jnp.asarray(xi), jnp.asarray(xv)


def _zero_rows(params, frac, rng):
    """Zero a random fraction of emb rows (the F-pruning zero-row pattern)."""
    for name in ("emb1", "emb2"):
        if name not in params:
            continue
        t = np.asarray(params[name]["dense"]).copy()
        kill = rng.random(t.shape[0]) < frac
        t[kill] = 0.0
        params[name]["dense"] = jnp.asarray(t)
    return params


def test_compact_matches_dense_row_pruned(rng):
    cfg, params, xi, xv = _case(rng)
    params = _zero_rows(params, 0.5, rng)
    want = np.asarray(deepfwfm.forward(params, xi, xv, cfg))
    cm = compact_for_serving(params, cfg)
    got = np.asarray(jax.jit(compact_forward)(cm, xi, xv))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    rep = compaction_report(params, cm, cfg)
    assert 30 < rep["emb2_zero_row_pct"] < 70
    assert rep["bytes_compact"] < rep["bytes_full"]


def test_compact_matches_dense_element_pruned(rng):
    """Unstructured DeepLight pruning: equivalence holds; tower barely shrinks
    (scattered zeros leave no dead units — the documented MXU reality)."""
    cfg, params, xi, xv = _case(rng)
    params = prune_params(params, jnp.float32(0.9), prune_fm=True,
                          prune_deep=True, prune_r=True)
    want = np.asarray(deepfwfm.forward(params, xi, xv, cfg))
    cm = compact_for_serving(params, cfg)
    got = np.asarray(jax.jit(compact_forward)(cm, xi, xv))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_compact_structured_shrinks_tower(rng):
    """Structured (unit) pruning at 75%: compaction drops the dead units and
    the tower's MAC count falls ~an order of magnitude, logits unchanged."""
    cfg, params, xi, xv = _case(rng)
    params = prune_params(params, jnp.float32(0.75), prune_fm=False,
                          prune_deep=True, prune_r=False, structured_deep=True)
    want = np.asarray(deepfwfm.forward(params, xi, xv, cfg))
    cm = compact_for_serving(params, cfg)
    got = np.asarray(jax.jit(compact_forward)(cm, xi, xv))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    rep = compaction_report(params, cm, cfg)
    assert rep["tower_mac_reduction"] > 5.0, rep
    # hidden widths actually shrank (32 → ~8)
    w1_shape = rep["tower_shapes_compact"][1]
    assert w1_shape[0] <= 12 and w1_shape[1] <= 12, rep


def test_constant_unit_bias_folding(rng):
    """A unit with zero incoming weights but nonzero bias contributes
    relu(b)·W_next — compaction must fold it, not drop it."""
    cfg, params, xi, xv = _case(rng)
    w0 = np.asarray(params["deep"]["net_1"]["layers"][0]["w"]).copy()
    b0 = np.asarray(params["deep"]["net_1"]["layers"][0]["b"]).copy()
    w0[:, 3] = 0.0
    b0[3] = 1.7          # positive → relu passes the constant through
    w0[:, 7] = 0.0
    b0[7] = -2.0         # negative → relu kills it; unit truly dead
    params["deep"]["net_1"]["layers"][0]["w"] = jnp.asarray(w0)
    params["deep"]["net_1"]["layers"][0]["b"] = jnp.asarray(b0)
    # also a dead unit in the LAST hidden layer → folds into the fc bias
    wl = np.asarray(params["deep"]["net_1"]["layers"][2]["w"]).copy()
    bl = np.asarray(params["deep"]["net_1"]["layers"][2]["b"]).copy()
    wl[:, 5] = 0.0
    bl[5] = 0.9
    params["deep"]["net_1"]["layers"][2]["w"] = jnp.asarray(wl)
    params["deep"]["net_1"]["layers"][2]["b"] = jnp.asarray(bl)

    want = np.asarray(deepfwfm.forward(params, xi, xv, cfg))
    cm = compact_for_serving(params, cfg)
    got = np.asarray(jax.jit(compact_forward)(cm, xi, xv))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # the three doctored units are gone from the compact tower
    assert cm.deep["layers"][0]["w"].shape[1] == 30
    assert cm.deep["layers"][2]["w"].shape[1] == 31


def test_compact_qr_model(rng):
    cfg, params, xi, xv = _case(rng, qr=True)
    params = _zero_rows(params, 0.4, rng)
    want = np.asarray(deepfwfm.forward(params, xi, xv, cfg))
    cm = compact_for_serving(params, cfg)
    got = np.asarray(jax.jit(compact_forward)(cm, xi, xv))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_compact_int8_close_and_smaller():
    rng = np.random.default_rng(7)   # own rng: the byte-ratio bound is tight
    cfg, params, xi, xv = _case(rng)
    params = _zero_rows(params, 0.5, rng)
    params = prune_params(params, jnp.float32(0.5), prune_fm=False,
                          prune_deep=True, prune_r=False, structured_deep=True)
    fp = np.asarray(deepfwfm.forward(params, xi, xv, cfg))
    cm8 = compact_for_serving(params, cfg, int8=True)
    got = np.asarray(jax.jit(compact_forward)(cm8, xi, xv))
    assert np.corrcoef(got, fp)[0, 1] > 0.99
    cm32 = compact_for_serving(params, cfg)
    # shared int32 remap + fp32 biases bound the ratio above 1/4
    assert cm8.size_bytes() < 0.6 * cm32.size_bytes()


def test_predictor_accepts_compact_model(rng):
    from xsdeepfwfm_deprecated_tpu.serving.predictor import Predictor
    cfg, params, xi, xv = _case(rng)
    params = _zero_rows(params, 0.5, rng)
    cm = compact_for_serving(params, cfg)
    pred = Predictor(cm)
    want = np.asarray(deepfwfm.forward(params, xi, xv, cfg))
    np.testing.assert_allclose(pred.logits(np.asarray(xi), np.asarray(xv)),
                               want, rtol=1e-5, atol=1e-5)


def test_structured_pruning_trains(tiny_criteo):
    """-prune_deep_structured end-to-end: fit reaches visible UNIT sparsity
    and still learns."""
    from xsdeepfwfm_deprecated_tpu.train.trainer import DeepFMEstimator
    field_size, train, _, _ = tiny_criteo
    mcfg = ModelConfig(field_size=field_size,
                       feature_sizes=tuple(train["feature_sizes"]),
                       numerical=13, embedding_size=4, h_depth=2, deep_nodes=32,
                       use_fwfm=True, use_deep=True)
    tcfg = TrainConfig(n_epochs=2, batch_size=256, learning_rate=1e-3,
                       random_seed=0, prune=True, prune_fm=False,
                       prune_deep=True, prune_deep_structured=True,
                       sparse=0.5, warm=0, prune_omega=1.0)
    est = DeepFMEstimator(mcfg, tcfg)
    est.fit(train["index"][:4096], train["value"][:4096],
            train["label"][:4096], [], [], [])
    w = np.asarray(est.params["deep"]["net_1"]["layers"][1]["w"])
    dead_units = np.mean(~np.any(w != 0, axis=0))
    assert dead_units > 0.02, dead_units
    p = est.predict_proba(train["index"][:128], train["value"][:128])
    assert np.all(np.isfinite(p))
