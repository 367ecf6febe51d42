"""Pruning-engine tests: thresholds, groups, adaptive schedule."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xsdeepfwfm_deprecated_tpu.compression import pruning
from xsdeepfwfm_deprecated_tpu.config import ModelConfig, TrainConfig
from xsdeepfwfm_deprecated_tpu.models import deepfwfm


def test_magnitude_threshold_matches_bisection():
    """quantile threshold ≡ the reference's bisection (:807-823) semantics."""
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(1000,)).astype(np.float32))
    for target in [0.1, 0.5, 0.9]:
        thr = float(pruning.magnitude_threshold(w, jnp.float32(target)))
        frac_below = float(jnp.mean(jnp.abs(w) < thr))
        assert abs(frac_below - target) < 0.01


def test_bisection_threshold_matches_quantile_large():
    """Above BISECT_SIZE the threshold switches to the reference's value-range
    bisection (model/DeepFMs.py:807-823); achieved sparsity must match the
    exact sort-based quantile far inside the reference's ±1e-4 tolerance."""
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(pruning.BISECT_SIZE + 7,)).astype(np.float32))
    for target in [0.05, 0.4, 0.9]:
        thr_b = float(pruning.magnitude_threshold(w, jnp.float32(target)))
        thr_q = float(jnp.quantile(jnp.abs(w), target))
        frac_b = float(jnp.mean(jnp.abs(w) < thr_b))
        assert abs(frac_b - target) < 1e-4
        assert abs(thr_b - thr_q) < 1e-4


def test_bisection_resolves_collapsed_row_cluster():
    """Round-5 regression (200k pruned golden): never-sampled embedding rows
    decay under Adam+L2 to |w| ~ 1e-18..1e-31; a LINEAR 40-halving bisection
    (resolution floor max·2⁻⁴⁰ ≈ 5e-13) returned a threshold ABOVE the whole
    cluster and wiped 80% of rows when the schedule asked for 2% (sparsity
    trajectory exploded vs torch, PARITY.md). The log-space bisection must
    land the threshold INSIDE the cluster and prune only the target."""
    rng = np.random.default_rng(3)
    n = pruning.BISECT_SIZE * 4
    w = rng.normal(size=(n,)).astype(np.float32) * 0.01
    # 80% collapsed cluster spanning the magnitudes observed at epochs 4-6
    k = int(n * 0.8)
    w[:k] = (np.abs(rng.normal(size=(k,))) + 0.1) * np.float32(1e-20)
    w64 = np.abs(w).astype(np.float64)
    for target in [0.02, 0.30, 0.79]:
        thr = float(pruning.magnitude_threshold(jnp.asarray(w),
                                                jnp.float32(target)))
        frac = float(np.mean(w64 < thr))
        assert abs(frac - target) < 1e-3, (target, frac, thr)
        # the 2%-target threshold must sit INSIDE the collapsed cluster
        if target < 0.8:
            assert thr < 5e-18, thr


def test_zero_target_prunes_nothing():
    """emb_r=0 (the paper's Avazu F-0 recipe) must leave the group untouched,
    including tiny Adam+L2-parked values ~1e-31 on never-sampled rows."""
    rng = np.random.default_rng(2)
    w = rng.normal(size=(pruning.BISECT_SIZE + 3,)).astype(np.float32)
    w[: w.size // 2] = 1e-31     # never-sampled-row plateau values
    thr = pruning.magnitude_threshold(jnp.asarray(w), jnp.float32(0.0))
    assert float(thr) == 0.0
    out = pruning.apply_threshold(jnp.asarray(w), thr)
    assert int(jnp.sum(out == 0)) == 0


def test_apply_threshold():
    w = jnp.asarray([-0.5, 0.01, 0.3, -0.02])
    out = np.asarray(pruning.apply_threshold(w, jnp.float32(0.1)))
    np.testing.assert_allclose(out, [-0.5, 0.0, 0.3, 0.0], atol=1e-7)


@pytest.fixture
def dfm_params():
    cfg = ModelConfig(field_size=4, feature_sizes=(1, 50, 60, 70), numerical=1,
                      embedding_size=8, h_depth=2, deep_nodes=32,
                      use_fwfm=True, use_deep=True, use_fwlw=True)
    return cfg, deepfwfm.init_params(jax.random.PRNGKey(0), cfg)


def test_prune_groups(dfm_params):
    cfg, params = dfm_params
    pruned = pruning.prune_params(params, jnp.float32(0.6), prune_fm=True,
                                  prune_deep=True, prune_r=True)
    # group (a): packed emb2 globally ~60% sparse
    emb = np.asarray(pruned["emb2"]["dense"])
    assert abs(np.mean(emb == 0) - 0.6) < 0.02
    # group (b): each DNN layer ~60% sparse; biases untouched; fc untouched
    for i, layer in enumerate(pruned["deep"]["net_1"]["layers"]):
        assert abs(float(jnp.mean(layer["w"] == 0)) - 0.6) < 0.05, f"layer {i}"
        assert float(jnp.mean(layer["b"] == 0)) < 0.2
    assert float(jnp.mean(pruned["deep"]["net_1"]["fc_w"] == 0)) == 0.0
    # fwlw pruned too (reference name-filter includes fwfm_linear)
    assert float(jnp.mean(pruned["fwlw_w"] == 0)) > 0.3
    # group (c): R pruned on symmetrized magnitude
    assert float(jnp.mean(pruned["field_cov"] == 0)) > 0.3
    # 1st-order embeddings never pruned
    np.testing.assert_array_equal(np.asarray(pruned.get("emb1", {"dense": jnp.zeros(1)})["dense"] if "emb1" in pruned else 0),
                                  np.asarray(params.get("emb1", {"dense": jnp.zeros(1)})["dense"] if "emb1" in params else 0))


def test_group_ratios(dfm_params):
    cfg, params = dfm_params
    pruned = pruning.prune_params(params, jnp.float32(0.5), emb_r=0.5, emb_corr=2.0,
                                  prune_fm=True, prune_deep=False, prune_r=True)
    emb = np.asarray(pruned["emb2"]["dense"])
    assert abs(np.mean(emb == 0) - 0.25) < 0.03         # 0.5 * emb_r(0.5)
    r = np.asarray(pruned["field_cov"])
    assert np.mean(r == 0) > 0.8                         # 0.5 * emb_corr(2.0) → clipped 1.0


def test_adaptive_schedule():
    tc = TrainConfig(sparse=0.9)
    assert tc.adaptive_sparse(0) == 0.0
    assert tc.adaptive_sparse(100) == pytest.approx(0.9 * (1 - 0.99), rel=1e-6)
    assert tc.adaptive_sparse(100000) == pytest.approx(0.9, abs=1e-4)


def test_sparsity_report(dfm_params):
    _, params = dfm_params
    rep = pruning.sparsity_report(params)
    assert rep["sparsity_pct"] == pytest.approx(0.0, abs=0.1)
    pruned = pruning.prune_params(params, jnp.float32(0.9), prune_fm=True,
                                  prune_deep=True, prune_r=True)
    rep2 = pruning.sparsity_report(pruned)
    assert rep2["sparsity_pct"] > 40
