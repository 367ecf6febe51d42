"""End-to-end training tests on the bundled tiny-criteo dataset.

The de-facto integration test of the reference is running each model variant
against tiny-criteo (SURVEY §4); these are the golden-metric versions.
"""

import numpy as np
import pytest

from xsdeepfwfm_deprecated_tpu.config import ModelConfig, TrainConfig
from xsdeepfwfm_deprecated_tpu.train.trainer import DeepFMEstimator


def small_cfgs(train, field_size, **model_kw):
    tkw = model_kw.pop("train_kw", {})
    base = dict(use_logit=False, use_fm=False, use_ffm=False, use_fwfm=False,
                use_deep=False)
    base.update(model_kw)
    mcfg = ModelConfig(field_size=field_size,
                       feature_sizes=tuple(train["feature_sizes"]),
                       numerical=13, embedding_size=4, h_depth=2, deep_nodes=32,
                       **base)
    tbase = dict(n_epochs=2, batch_size=1024, learning_rate=1e-3, random_seed=0)
    tbase.update(tkw)
    tcfg = TrainConfig(**tbase)
    return mcfg, tcfg


@pytest.mark.slow
def test_lr_trains_on_tiny_criteo(tiny_criteo):
    """LR learns (loss falls, AUC above chance). Absolute numbers are modest:
    the reference's N(0,1) 1st-order init (model/DeepFMs.py:479), reproduced
    here, needs far more steps than tiny-criteo's 10k rows provide."""
    field_size, train, valid, test = tiny_criteo
    mcfg, tcfg = small_cfgs(train, field_size, use_logit=True, use_deep=False,
                            train_kw=dict(n_epochs=4, batch_size=512,
                                          learning_rate=1e-2))
    est = DeepFMEstimator(mcfg, tcfg)
    est.fit(train["index"], train["value"], train["label"],
            valid["index"], valid["value"], valid["label"])
    loss, auc, prauc, rce = est.eval_by_batch(test["index"], test["value"], test["label"])
    assert auc > 0.53, f"LR AUC {auc} too low"
    assert est.valid_result[-1] > est.valid_result[0] - 0.02


@pytest.mark.slow
def test_deepfwfm_trains_on_tiny_criteo(tiny_criteo):
    field_size, train, valid, test = tiny_criteo
    mcfg, tcfg = small_cfgs(train, field_size, use_fwfm=True, use_deep=True,
                            use_lw=True, use_fwlw=True,
                            train_kw=dict(n_epochs=6, batch_size=512))
    est = DeepFMEstimator(mcfg, tcfg)
    est.fit(train["index"], train["value"], train["label"],
            valid["index"], valid["value"], valid["label"])
    loss, auc, prauc, rce = est.eval_by_batch(test["index"], test["value"], test["label"])
    assert auc > 0.66, f"DeepFwFM AUC {auc} too low"
    assert len(est.train_result) == 6 and len(est.valid_result) == 6


@pytest.mark.slow
def test_pruned_training_reaches_target_sparsity(tiny_criteo):
    field_size, train, _, _ = tiny_criteo
    # prune_omega=1 compresses the adaptive schedule s_t = S(1-0.99^(t/Ω))
    # so a 2-epoch test reaches visible sparsity (at the default Ω=100 the
    # reference schedule needs thousands of iterations, paper §5.3)
    mcfg, tcfg = small_cfgs(
        train, field_size, use_fwfm=True, use_deep=True,
        train_kw=dict(prune=True, prune_fm=True, prune_deep=True, prune_r=True,
                      sparse=0.5, warm=0, n_epochs=2, batch_size=256,
                      prune_omega=1.0))
    est = DeepFMEstimator(mcfg, tcfg)
    est.fit(train["index"][:4096], train["value"][:4096], train["label"][:4096], [], [], [])
    import jax.numpy as jnp
    # DNN hidden layers should be visibly sparse after the adaptive schedule
    w = est.params["deep"]["net_1"]["layers"][1]["w"]
    frac_zero = float(jnp.mean(w == 0))
    assert frac_zero > 0.05, f"expected pruning to zero weights, got {frac_zero}"
    emb_zero = float(jnp.mean(est.params["emb2"]["dense"] == 0))
    assert emb_zero > 0.05, f"expected emb pruning, got {emb_zero}"


def test_early_stopping_logic():
    mcfg = ModelConfig(field_size=2, feature_sizes=(1, 3), numerical=1,
                       use_logit=True, use_fwfm=False, use_deep=False)
    est = DeepFMEstimator(mcfg, TrainConfig())
    assert not est.training_termination([0.5, 0.6, 0.55, 0.54])
    assert est.training_termination([0.5, 0.6, 0.59, 0.58, 0.57])
    assert not est.training_termination([0.5, 0.6, 0.59, 0.60, 0.57])


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path, tiny_criteo):
    field_size, train, _, _ = tiny_criteo
    mcfg, tcfg = small_cfgs(train, field_size, use_fwfm=True, use_deep=True,
                            train_kw=dict(n_epochs=1))
    est = DeepFMEstimator(mcfg, tcfg)
    est.fit(train["index"][:2048], train["value"][:2048], train["label"][:2048], [], [], [],
            save_path=str(tmp_path / "ck"))
    preds = est.predict_proba(train["index"][:256], train["value"][:256])

    est2 = DeepFMEstimator(mcfg, tcfg)
    est2.load(str(tmp_path / "ck"))
    preds2 = est2.predict_proba(train["index"][:256], train["value"][:256])
    np.testing.assert_allclose(preds, preds2, rtol=1e-6)


@pytest.mark.slow
def test_kd_student_trains(tiny_criteo):
    field_size, train, _, _ = tiny_criteo
    sl = slice(0, 2048)
    mcfg_t, tcfg = small_cfgs(train, field_size, use_fwfm=True, use_deep=True,
                              train_kw=dict(n_epochs=1))
    teacher = DeepFMEstimator(mcfg_t, tcfg)
    teacher.fit(train["index"][sl], train["value"][sl], train["label"][sl], [], [], [])

    mcfg_s, tcfg_s = small_cfgs(train, field_size, use_fwfm=True, use_deep=True,
                                train_kw=dict(n_epochs=1))
    student = DeepFMEstimator(mcfg_s, tcfg_s)
    student.fit(train["index"][sl], train["value"][sl], train["label"][sl], [], [], [],
                teacher_model=teacher)
    p = student.predict_proba(train["index"][:100], train["value"][:100])
    assert np.all(np.isfinite(p)) and p.shape == (100,)


@pytest.mark.slow
def test_resume_training(tmp_path, tiny_criteo):
    """Checkpoint → resume continues from the saved epoch with optimizer state."""
    field_size, train, _, _ = tiny_criteo
    sl = slice(0, 2048)
    mcfg, tcfg2 = small_cfgs(train, field_size, use_fwfm=True, use_deep=True,
                             train_kw=dict(n_epochs=2))
    est = DeepFMEstimator(mcfg, tcfg2)
    est.fit(train["index"][sl], train["value"][sl], train["label"][sl], [], [], [],
            save_path=str(tmp_path / "ck"))

    # resume into a 3-epoch schedule: only epoch 3 should run
    _, tcfg3 = small_cfgs(train, field_size, use_fwfm=True, use_deep=True,
                          train_kw=dict(n_epochs=3))
    est2 = DeepFMEstimator(mcfg, tcfg3)
    est2.init_params()
    est2.fit(train["index"][sl], train["value"][sl], train["label"][sl], [], [], [],
             resume_from=str(tmp_path / "ck"))
    assert len(est2.train_result) == 1  # epochs 0-1 skipped, epoch 2 ran


def test_sparse_checkpoint_roundtrip(tmp_path):
    """COO-encoded pruned checkpoints shrink on disk and restore exactly."""
    import jax, os
    import jax.numpy as jnp
    from xsdeepfwfm_deprecated_tpu.models import deepfwfm
    from xsdeepfwfm_deprecated_tpu.compression.pruning import prune_params
    from xsdeepfwfm_deprecated_tpu.train import checkpoint as ckpt

    cfg = ModelConfig(field_size=4, feature_sizes=(1, 500, 600, 700), numerical=1,
                      embedding_size=8, h_depth=2, deep_nodes=64,
                      use_fwfm=True, use_deep=True)
    params = deepfwfm.init_params(jax.random.PRNGKey(0), cfg)
    pruned = prune_params(params, jnp.float32(0.9), prune_fm=True,
                          prune_deep=True, prune_r=True)

    p_dense = tmp_path / "dense"
    p_sparse = tmp_path / "sparse"
    ckpt.save_checkpoint(str(p_dense), pruned, sparse=False)
    ckpt.save_checkpoint(str(p_sparse), pruned, sparse=True)
    sz_dense = os.path.getsize(str(p_dense) + ".npz")
    sz_sparse = os.path.getsize(str(p_sparse) + ".npz")
    assert sz_sparse < 0.5 * sz_dense, (sz_sparse, sz_dense)

    restored, _, _ = ckpt.load_checkpoint(str(p_sparse), params)
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(pruned)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_steps_per_call_equivalent(tiny_criteo):
    """K-steps-per-dispatch training matches step-at-a-time training."""
    field_size, train, _, _ = tiny_criteo
    sl = slice(0, 2048)
    import jax.numpy as jnp

    results = {}
    for k in (1, 4):
        mcfg, tcfg = small_cfgs(train, field_size, use_fwfm=True, use_deep=True,
                                train_kw=dict(n_epochs=1, batch_size=256,
                                              steps_per_call=k))
        # deterministic: no dropout so the rng schedule difference is moot
        import dataclasses
        mcfg = dataclasses.replace(mcfg, is_deep_dropout=False,
                                   is_shallow_dropout=False)
        est = DeepFMEstimator(mcfg, tcfg)
        est.fit(train["index"][sl], train["value"][sl], train["label"][sl], [], [], [])
        results[k] = est.params

    for a, b in zip(__import__("jax").tree.leaves(results[1]),
                    __import__("jax").tree.leaves(results[4])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)


def test_fused_prune_matches_per_batch(tiny_criteo):
    """VERDICT r1 #5: prune=1 with steps_per_call>1 fuses K=prune_interval
    train steps + one prune refresh into a single dispatch, with schedule
    values (and resulting params) identical to the per-batch K=1 path —
    including an interval boundary mid-epoch AND the is_last tail fire
    (8 batches, interval 3 → fires at n_iter 3, 6, 8)."""
    field_size, train, _, _ = tiny_criteo
    sl = slice(0, 2048)
    import dataclasses

    results = {}
    for k in (1, 4):   # k>1 is the opt-in; fused K becomes prune_interval=3
        mcfg, tcfg = small_cfgs(
            train, field_size, use_fwfm=True, use_deep=True, use_lw=True,
            train_kw=dict(n_epochs=2, batch_size=256, steps_per_call=k,
                          prune=True, prune_fm=True, prune_deep=True,
                          prune_r=True, sparse=0.5, warm=1, prune_omega=1.0,
                          prune_interval=3))
        mcfg = dataclasses.replace(mcfg, is_deep_dropout=False,
                                   is_shallow_dropout=False)
        est = DeepFMEstimator(mcfg, tcfg)
        est.fit(train["index"][sl], train["value"][sl], train["label"][sl], [], [], [])
        results[k] = est.params

    import jax
    from xsdeepfwfm_deprecated_tpu.compression.pruning import sparsity_report
    # schedule ceiling here is s = 0.5·(1−0.99^8) ≈ 3.8%
    assert sparsity_report(results[4])["sparsity_pct"] > 2.0
    for a, b in zip(jax.tree.leaves(results[1]), jax.tree.leaves(results[4])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)


@pytest.mark.slow
def test_ffm_and_deep_only_train(tiny_criteo):
    """FFM and deep-only families train end-to-end (smoke, small slices)."""
    field_size, train, _, _ = tiny_criteo
    sl = slice(0, 1024)
    for flags in (dict(use_ffm=True), dict(use_deep=True)):
        mcfg, tcfg = small_cfgs(train, field_size,
                                train_kw=dict(n_epochs=1, batch_size=512),
                                **flags)
        est = DeepFMEstimator(mcfg, tcfg)
        est.fit(train["index"][sl], train["value"][sl], train["label"][sl], [], [], [])
        p = est.predict_proba(train["index"][:64], train["value"][:64])
        assert np.all(np.isfinite(p)), flags


@pytest.mark.slow
def test_qat_training_end_to_end(tiny_criteo):
    """QAT: fake-quant training runs and converts to a close int8 model."""
    import dataclasses
    import jax.numpy as jnp
    field_size, train, _, _ = tiny_criteo
    sl = slice(0, 2048)
    mcfg, tcfg = small_cfgs(train, field_size, use_fwfm=True, use_deep=True,
                            train_kw=dict(n_epochs=2, batch_size=512))
    mcfg = dataclasses.replace(mcfg, quantization_aware=True)
    est = DeepFMEstimator(mcfg, tcfg)
    est.fit(train["index"][sl], train["value"][sl], train["label"][sl], [], [], [])

    # convert to a true int8 model (reference converts on eval, :751-755)
    from xsdeepfwfm_deprecated_tpu.compression.quantization import (convert,
                                                                    quantized_forward)
    qm = convert(est.params, est.mcfg, mode="qat")
    xi = jnp.asarray(train["index"][:256].astype(np.int32))
    xv = jnp.asarray(train["value"][:256].astype(np.float32))
    q_logits = np.asarray(quantized_forward(qm, xi, xv))
    fp_logits = est._predict_logits(train["index"][:256], train["value"][:256])
    assert np.corrcoef(q_logits, fp_logits)[0, 1] > 0.99


def test_eval_train_rows_caps_epoch_telemetry(tiny_criteo):
    """eval_train_rows=N evaluates per-epoch TRAIN metrics on the first N rows
    only (cheap telemetry on multi-million-row runs); training itself and the
    valid eval still see every row."""
    field_size, train, valid, _ = tiny_criteo
    mcfg, tcfg = small_cfgs(train, field_size, use_fwfm=True,
                            train_kw=dict(n_epochs=1, batch_size=512,
                                          eval_train_rows=700))
    est = DeepFMEstimator(mcfg, tcfg)
    est.fit(train["index"], train["value"], train["label"],
            valid["index"], valid["value"], valid["label"])
    # one full epoch over ALL rows ran (step counter) + both evals recorded
    assert est._step == -(-len(train["label"]) // 512)
    assert len(est.train_result) == 1 and len(est.valid_result) == 1
    # the capped train-metric matches an explicit eval on the post-shuffle
    # first 700 rows' ordering is internal; just require a sane AUC in (0, 1)
    assert 0.0 < est.train_result[0] < 1.0


def test_scanned_eval_matches_per_batch(tiny_criteo):
    """The K-batches-per-dispatch scanned eval returns bitwise-same logits as
    the per-batch path, across scan groups, full remainder batches, and a
    padded partial tail."""
    from xsdeepfwfm_deprecated_tpu.train.trainer import EVAL_SCAN_K

    field_size, train, _, _ = tiny_criteo
    mcfg, tcfg = small_cfgs(train, field_size, use_fwfm=True, use_deep=True,
                            train_kw=dict(eval_batch_size=64))
    est = DeepFMEstimator(mcfg, tcfg)
    est.init_params()

    bs = tcfg.eval_batch_size
    # one scan group + one full batch + a partial tail
    n = EVAL_SCAN_K * bs + bs + 17
    xi, xv = train["index"][:n], train["value"][:n]
    got = est._predict_logits(xi, xv)
    assert got.shape == (n,)

    import jax.numpy as jnp
    want = []
    for lo in range(0, n, bs):
        want.append(np.asarray(est.eval_fn(
            est.params, jnp.asarray(xi[lo:lo + bs].astype(np.int32)),
            jnp.asarray(xv[lo:lo + bs].astype(np.float32)))))
    np.testing.assert_allclose(got, np.concatenate(want), rtol=1e-6, atol=1e-6)


def test_orbax_checkpoint_roundtrip(tmp_path):
    """orbax backend: async save → durable dir; full and params-only restore;
    load_checkpoint auto-detects the .orbax directory."""
    import optax
    from xsdeepfwfm_deprecated_tpu.train import checkpoint as ckpt

    params = {"w": np.arange(12, dtype=np.float32).reshape(3, 4),
              "b": {"x": np.float32(2.0)}}
    opt = optax.adam(1e-3)
    state = opt.init(params)
    p = str(tmp_path / "model")
    ckpt.save_checkpoint(p, params, state, step=7, epoch=3, backend="orbax",
                         metadata={"model": "test"})
    ckpt.wait_for_saves()

    tmpl = {"w": np.zeros((3, 4), np.float32), "b": {"x": np.float32(0.0)}}
    rp, rs, meta = ckpt.load_checkpoint(p, tmpl, opt.init(tmpl))
    np.testing.assert_array_equal(rp["w"], params["w"])
    assert meta["step"] == 7 and meta["epoch"] == 3
    assert rs is not None

    rp2, rs2, _ = ckpt.load_checkpoint(p, tmpl)   # params-only restore
    np.testing.assert_array_equal(rp2["w"], params["w"])
    assert rs2 is None

    # per-epoch overwrite (force=True path)
    params["w"] = params["w"] + 1.0
    ckpt.save_checkpoint(p, params, state, step=8, epoch=4, backend="orbax")
    ckpt.wait_for_saves()
    rp3, _, meta3 = ckpt.load_checkpoint(p, tmpl)
    np.testing.assert_array_equal(rp3["w"], params["w"])
    assert meta3["epoch"] == 4


def test_orbax_opt_state_values_nonalphabetical_namedtuple(tmp_path):
    """Restored opt_state leaf VALUES land on the right namedtuple fields even
    when field order isn't alphabetical (orbax hands namedtuples back as
    key-sorted dicts; a flat-leaf-order rebuild would swap them)."""
    import jax.numpy as jnp
    import optax
    from xsdeepfwfm_deprecated_tpu.train import checkpoint as ckpt

    params = {"w": np.full((2, 2), 3.0, np.float32)}
    # ApplyIfFiniteState fields: notfinite_count, last_finite, total_notfinite,
    # inner_state — NOT alphabetical
    opt = optax.apply_if_finite(optax.adam(1e-3), 5)
    state = opt.init(params)
    state = state._replace(notfinite_count=jnp.asarray(7),
                           total_notfinite=jnp.asarray(9))
    p = str(tmp_path / "naf")
    ckpt.save_checkpoint(p, params, state, step=1, epoch=0, backend="orbax")
    ckpt.wait_for_saves()

    tmpl = {"w": np.zeros((2, 2), np.float32)}
    rp, rs, _ = ckpt.load_checkpoint(p, tmpl, opt.init(tmpl))
    assert int(rs.notfinite_count) == 7
    assert int(rs.total_notfinite) == 9
    # adam moments buried inside inner_state restore to the right leaves
    mu = rs.inner_state[0].mu["w"]
    np.testing.assert_array_equal(np.asarray(mu), np.zeros((2, 2), np.float32))
    np.testing.assert_array_equal(rp["w"], params["w"])


def test_orbax_strict_false_partial_restore(tmp_path):
    """strict=False keeps template values for entries missing from an orbax
    checkpoint; strict=True raises (parity with the npz backend and the
    reference's strict=False sparse load, utils/util.py:45-55)."""
    import pytest
    from xsdeepfwfm_deprecated_tpu.train import checkpoint as ckpt

    params = {"w": np.ones((2, 2), np.float32)}
    p = str(tmp_path / "partial")
    ckpt.save_checkpoint(p, params, None, backend="orbax")
    ckpt.wait_for_saves()

    bigger = {"w": np.zeros((2, 2), np.float32),
              "extra": np.full((3,), 5.0, np.float32)}
    rp, _, _ = ckpt.load_checkpoint(p, bigger, strict=False)
    np.testing.assert_array_equal(rp["w"], params["w"])
    np.testing.assert_array_equal(rp["extra"], bigger["extra"])
    with pytest.raises(KeyError):
        ckpt.load_checkpoint(p, bigger, strict=True)


def test_loss_log_mean_matches_across_k(tiny_criteo):
    """VERDICT r2 #5: the logged "mean train-step loss" means the same thing
    at every steps_per_call — per-REAL-step mean, with phantom tail steps
    excluded. 2048 rows @ batch 256 = 8 batches; K=10 makes one group with 2
    phantom steps, the exact case that skewed the old K-sum logging."""
    field_size, train, _, _ = tiny_criteo
    sl = slice(0, 2048)
    import dataclasses

    means, losses = {}, {}
    for k in (1, 10):
        mcfg, tcfg = small_cfgs(train, field_size, use_fwfm=True, use_deep=True,
                                train_kw=dict(n_epochs=1, batch_size=256,
                                              steps_per_call=k))
        mcfg = dataclasses.replace(mcfg, is_deep_dropout=False,
                                   is_shallow_dropout=False)
        est = DeepFMEstimator(mcfg, tcfg)
        est.fit(train["index"][sl], train["value"][sl], train["label"][sl], [], [], [])
        means[k] = est.last_epoch_mean_loss
    assert np.isfinite(means[1]) and np.isfinite(means[10])
    np.testing.assert_allclose(means[1], means[10], rtol=1e-4)


def test_kd_multi_step_matches_k1(tiny_criteo):
    """VERDICT r2 #6: KD at steps_per_call>1 stacks teacher logits into the
    (K, B) groups — same params and same logged loss as K=1 KD."""
    field_size, train, _, _ = tiny_criteo
    sl = slice(0, 2048)
    import dataclasses
    import jax

    mcfg_t, tcfg_t = small_cfgs(train, field_size, use_fwfm=True, use_deep=True,
                                train_kw=dict(n_epochs=1))
    teacher = DeepFMEstimator(mcfg_t, tcfg_t)
    teacher.fit(train["index"][sl], train["value"][sl], train["label"][sl], [], [], [])

    results, means = {}, {}
    for k in (1, 4):
        mcfg, tcfg = small_cfgs(train, field_size, use_fwfm=True, use_deep=True,
                                train_kw=dict(n_epochs=1, batch_size=256,
                                              steps_per_call=k))
        mcfg = dataclasses.replace(mcfg, is_deep_dropout=False,
                                   is_shallow_dropout=False)
        est = DeepFMEstimator(mcfg, tcfg)
        est.fit(train["index"][sl], train["value"][sl], train["label"][sl], [], [], [],
                teacher_model=teacher)
        results[k] = est.params
        means[k] = est.last_epoch_mean_loss
    np.testing.assert_allclose(means[1], means[4], rtol=1e-4)
    for a, b in zip(jax.tree.leaves(results[1]), jax.tree.leaves(results[4])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)


def test_super_layout_fit_matches_flat(rng):
    """-table_layout super (the default) trains to metrics IDENTICAL to the
    flat (N, E) layout — the super-row packing is a physical-layout change
    only (round 4, ops/superpack.py). Covers the packed fit → unpacked
    predict boundary, keep_best, and the per-epoch checkpoint."""
    sizes = (1, 1, 1, 40, 56, 300)
    mcfg = ModelConfig(field_size=6, feature_sizes=sizes, numerical=3,
                       embedding_size=10, use_fwfm=True, use_deep=True,
                       use_lw=True, use_fwlw=True, deep_nodes=16)
    n = 1024
    xi = rng.integers(0, [40, 56, 300], size=(n, 3)).astype(np.int32)
    xv = rng.normal(size=(n, 3)).astype(np.float32)
    y = (rng.random(n) < 0.3).astype(np.float32)

    res = {}
    for layout in ("super", "flat"):
        tcfg = TrainConfig(n_epochs=2, batch_size=128, random_seed=7,
                           table_layout=layout)
        est = DeepFMEstimator(mcfg, tcfg)
        est.fit(xi, xv, y, xi[:256], xv[:256], y[:256], keep_best=True)
        res[layout] = (np.array(est.eval_by_batch(xi, xv, y)),
                       est.predict_proba(xi[:64], xv[:64]))
        # params come back in the logical layout either way
        assert est.params["emb2"]["dense"].shape == (sum(sizes), 10)
        assert est.best_params is not None
    np.testing.assert_allclose(res["super"][0], res["flat"][0],
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(res["super"][1], res["flat"][1],
                               rtol=2e-5, atol=2e-6)


def test_super_layout_fit_with_prune_and_multistep(rng):
    """Fused-prune multi-step dispatch (K=prune_interval) runs on packed
    tables; sparsity schedule matches the flat layout's."""
    from xsdeepfwfm_deprecated_tpu.compression.pruning import sparsity_report
    sizes = (1, 1, 1, 40, 56, 300)
    mcfg = ModelConfig(field_size=6, feature_sizes=sizes, numerical=3,
                       embedding_size=10, use_fwfm=True, use_deep=True,
                       use_lw=True, use_fwlw=True, deep_nodes=16)
    n = 1024
    xi = rng.integers(0, [40, 56, 300], size=(n, 3)).astype(np.int32)
    xv = rng.normal(size=(n, 3)).astype(np.float32)
    y = (rng.random(n) < 0.3).astype(np.float32)
    sp = {}
    for layout in ("super", "flat"):
        tcfg = TrainConfig(n_epochs=2, batch_size=128, random_seed=7,
                           table_layout=layout, prune=True, sparse=0.5,
                           warm=0, prune_r=True, steps_per_call=4)
        est = DeepFMEstimator(mcfg, tcfg)
        est.fit(xi, xv, y)
        sp[layout] = sparsity_report(est.params)["sparsity_pct"]
    assert sp["super"] > 0.0
    assert sp["super"] == pytest.approx(sp["flat"], abs=0.2)
