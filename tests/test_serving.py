"""Serving-layer tests: Predictor + run_benchmark harness (CPU)."""

import numpy as np
import pytest

import jax

from xsdeepfwfm_deprecated_tpu.compression import quantization as Q
from xsdeepfwfm_deprecated_tpu.config import ModelConfig
from xsdeepfwfm_deprecated_tpu.models import deepfwfm
from xsdeepfwfm_deprecated_tpu.serving.benchmark import run_benchmark
from xsdeepfwfm_deprecated_tpu.serving.predictor import Predictor


@pytest.fixture(scope="module")
def served_model(rng):
    cfg = ModelConfig(field_size=5, feature_sizes=(1, 1, 30, 40, 50), numerical=2,
                      embedding_size=4, h_depth=2, deep_nodes=16,
                      use_fwfm=True, use_deep=True)
    params = deepfwfm.init_params(jax.random.PRNGKey(0), cfg)
    xi = rng.integers(0, [30, 40, 50], size=(300, 3)).astype(np.int32)
    xv = rng.normal(size=(300, 2)).astype(np.float32)
    y = (rng.random(300) < 0.3).astype(np.float64)
    return cfg, params, xi, xv, y


def test_predictor_fp32(served_model):
    cfg, params, xi, xv, y = served_model
    p = Predictor(params, cfg).warmup(batch_sizes=(1, 64))
    probs = p.predict_proba(xi, xv)
    assert probs.shape == (300,)
    assert np.all((probs > 0) & (probs < 1))
    assert p.predict(xi[:5], xv[:5]).dtype == bool


def test_predictor_quantized_matches_fp32(served_model):
    cfg, params, xi, xv, y = served_model
    fp = Predictor(params, cfg).predict_proba(xi, xv)
    q = Predictor(Q.convert(params, cfg, mode="dynamic")).predict_proba(xi, xv)
    assert np.corrcoef(fp, q)[0, 1] > 0.999


def test_run_benchmark_reports(served_model, tmp_path):
    cfg, params, xi, xv, y = served_model
    res = run_benchmark(Predictor(params, cfg), xi, xv, y, batch_size=128,
                        n_single=5, trace_dir=str(tmp_path / "trace"))
    for key in ("loss", "auc", "prauc", "rce", "batch_ms", "examples_per_s",
                "examples_per_s_per_chip", "single_example_ms"):
        assert key in res and np.isfinite(res[key]), key
    assert res["examples_per_s"] > 0
    # op-level summary (reference key_averages counterpart) is included:
    # per-component wall clock + XLA cost analysis of the compiled forward
    comp = [k for k in res if k.startswith("component_ms/")]
    assert "component_ms/Full forward" in comp
    assert "component_ms/Deep tower (MLP)" in comp
    assert "component_ms/FwFM interaction (R-weighted pairs)" in comp
    assert all(res[k] > 0 for k in comp)
    assert res.get("flops_per_batch", 1.0) > 0


def test_op_summary_quantized(served_model):
    """Quantized predictors get the full-forward row + cost analysis (no
    fp32 component sub-functions)."""
    from xsdeepfwfm_deprecated_tpu.serving.benchmark import op_summary
    cfg, params, xi, xv, y = served_model
    p = Predictor(Q.convert(params, cfg, mode="dynamic"))
    res = op_summary(p, xi[:64], xv[:64], log=lambda *a: None)
    assert res["component_ms/Full forward"] > 0


def test_grouped_serving_lookup_matches_flat(served_model, rng, monkeypatch):
    """Round-5 grouped layout: split_serving_tables + grouped_lookup_serving
    reproduce packed_lookup_serving exactly (incl. the per-field clip on
    out-of-range indices), with the cap forced small enough to split."""
    from xsdeepfwfm_deprecated_tpu.ops import embedding as emb
    cfg, params, xi, xv, y = served_model
    monkeypatch.setattr(emb, "SERVING_GROUP_LANE_BYTES", 200)  # ≤50 f32 rows
    spec = deepfwfm.make_embedding_spec(cfg)
    tables = params["emb2"]
    xi_bad = xi.copy()
    xi_bad[0] = [999, -3, 999]                  # exercise the per-field clip
    want = np.asarray(emb.packed_lookup_serving(tables, spec, xi_bad, xv))
    grouped = emb.split_serving_tables(tables, spec)
    assert len(grouped["dense_groups"]) == 3    # 30/40/50-row fields split
    got = np.asarray(emb.grouped_lookup_serving(grouped, spec, xi_bad, xv))
    np.testing.assert_array_equal(got, want)


def test_predictor_grouped_layout_matches_flat(served_model, monkeypatch):
    from xsdeepfwfm_deprecated_tpu.ops import embedding as emb
    cfg, params, xi, xv, y = served_model
    monkeypatch.setattr(emb, "SERVING_GROUP_LANE_BYTES", 200)
    flat = Predictor(params, cfg, layout="flat").logits(xi, xv)
    grouped = Predictor(params, cfg, layout="grouped").logits(xi, xv)
    np.testing.assert_allclose(grouped, flat, rtol=1e-6, atol=1e-6)


def test_predictor_quantized_grouped_matches_single(served_model, monkeypatch):
    """int8 grouped layout (group_quantized_tables) ≡ the single-gather int8
    path on in-range indices."""
    from xsdeepfwfm_deprecated_tpu.ops import embedding as emb
    cfg, params, xi, xv, y = served_model
    monkeypatch.setattr(emb, "SERVING_GROUP_LANE_BYTES", 200)
    qm = Q.convert(params, cfg, mode="dynamic")
    single = Predictor(qm, layout="flat").logits(xi, xv)
    grouped = Predictor(qm, layout="grouped").logits(xi, xv)
    np.testing.assert_allclose(grouped, single, rtol=1e-5, atol=1e-5)


def test_predictor_auto_layout_selection(served_model, monkeypatch):
    """layout='auto' (the default) selects the grouped split for unpacked
    dense-dict models and falls back to flat for QR configs
    (serving/predictor.py round-5 product default)."""
    import dataclasses

    from xsdeepfwfm_deprecated_tpu.ops import embedding as emb
    cfg, params, xi, xv, y = served_model
    monkeypatch.setattr(emb, "SERVING_GROUP_LANE_BYTES", 200)
    p = Predictor(params, cfg)                       # auto → grouped
    assert "dense_groups" in p._model["emb2"]
    np.testing.assert_allclose(
        p.logits(xi, xv),
        Predictor(params, cfg, layout="flat").logits(xi, xv),
        rtol=1e-6, atol=1e-6)
    qcfg = dataclasses.replace(cfg, qr_flag=True, qr_collisions=2,
                               qr_threshold=35)
    qparams = deepfwfm.init_params(jax.random.PRNGKey(1), qcfg)
    pq = Predictor(qparams, qcfg)                    # auto → flat (QR)
    assert "dense_groups" not in pq._model["emb2"]
    # int8: auto groups too
    qm = Q.convert(params, cfg, mode="dynamic")
    pg = Predictor(qm)
    assert "qs_groups" in pg._model.emb2_q["dense"]
