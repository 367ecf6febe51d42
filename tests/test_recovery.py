"""Failure detection + auto-resume supervision (train/recovery.py, SURVEY §5.3).

Fault injection: ``batching.prefetch_to_device`` is wrapped so a chosen call
raises ``RuntimeError`` mid-stream — the shape of a transient device/tunnel
loss on a remote-attached TPU. The reference has no failure handling at all.
"""

import numpy as np
import pytest

from xsdeepfwfm_deprecated_tpu.config import ModelConfig, TrainConfig
from xsdeepfwfm_deprecated_tpu.data import batching
from xsdeepfwfm_deprecated_tpu.train import checkpoint as ckpt
from xsdeepfwfm_deprecated_tpu.train.recovery import fit_with_recovery
from xsdeepfwfm_deprecated_tpu.train.trainer import DeepFMEstimator

F_SIZES = (1,) * 13 + (40, 60, 30)


def _case(rng, n=2048):
    mcfg = ModelConfig(field_size=16, feature_sizes=F_SIZES, numerical=13,
                       embedding_size=4, h_depth=2, deep_nodes=16,
                       use_fwfm=True, use_deep=True, use_lw=True)
    tcfg = TrainConfig(n_epochs=3, batch_size=512, learning_rate=1e-3,
                       random_seed=0)
    xi = rng.integers(0, [40, 60, 30], size=(n, 3)).astype(np.int32)
    xv = rng.normal(size=(n, 13)).astype(np.float32)
    y = (rng.random(n) < 0.3).astype(np.float32)
    return mcfg, tcfg, xi, xv, y


def _inject_failure_at_call(monkeypatch, fail_call: int, after_items: int = 1):
    """Make the ``fail_call``-th prefetch_to_device call raise mid-iteration."""
    orig = batching.prefetch_to_device
    calls = {"n": 0}

    def flaky(it, **kw):
        calls["n"] += 1
        if calls["n"] == fail_call:
            def gen():
                for i, item in enumerate(orig(it, **kw)):
                    yield item
                    if i + 1 >= after_items:
                        raise RuntimeError("injected device loss")
            return gen()
        return orig(it, **kw)

    monkeypatch.setattr(batching, "prefetch_to_device", flaky)
    return calls


def test_recovery_resumes_from_epoch_checkpoint(rng, tmp_path, monkeypatch):
    """Failure in epoch 2's train loop (after the epoch-1 checkpoint) →
    restart resumes at epoch 2 and completes the remaining epochs."""
    mcfg, tcfg, xi, xv, y = _case(rng)
    # per epoch (steps_per_call=1): call 1 = train loop, 2 = train-metric
    # eval, 3 = valid eval; checkpoint saves after valid eval → call 4 is
    # epoch 2's train loop, past the epoch-1 save
    _inject_failure_at_call(monkeypatch, fail_call=4)
    est = DeepFMEstimator(mcfg, tcfg)
    path = str(tmp_path / "ck")
    fit_with_recovery(est, xi, xv, y, xi[:512], xv[:512], y[:512],
                      save_path=path, max_restarts=2)
    # resumed fit ran epochs 2..3 only
    assert len(est.valid_result) == 2
    assert all(np.isfinite(v) for v in est.valid_result)
    _, _, meta = ckpt.load_checkpoint(path, est.params, None)
    assert meta["epoch"] == tcfg.n_epochs - 1


def test_recovery_restarts_from_scratch_without_checkpoint(rng, tmp_path,
                                                           monkeypatch):
    """Failure before any checkpoint exists → clean restart from scratch."""
    mcfg, tcfg, xi, xv, y = _case(rng)
    _inject_failure_at_call(monkeypatch, fail_call=1)
    est = DeepFMEstimator(mcfg, tcfg)
    path = str(tmp_path / "ck")
    fit_with_recovery(est, xi, xv, y, xi[:512], xv[:512], y[:512],
                      save_path=path, max_restarts=1)
    assert len(est.valid_result) == tcfg.n_epochs


def test_recovery_exhausts_max_restarts(rng, tmp_path, monkeypatch):
    """A persistent failure re-raises once max_restarts is exhausted."""
    mcfg, tcfg, xi, xv, y = _case(rng)

    def always_fail(it, **kw):
        raise RuntimeError("persistent device loss")

    monkeypatch.setattr(batching, "prefetch_to_device", always_fail)
    est = DeepFMEstimator(mcfg, tcfg)
    with pytest.raises(RuntimeError, match="persistent device loss"):
        fit_with_recovery(est, xi, xv, y, save_path=str(tmp_path / "ck"),
                          max_restarts=2)


def test_recovery_does_not_mask_bugs(rng, tmp_path, monkeypatch):
    """Non-transient error classes (bugs) re-raise immediately, uncounted."""
    mcfg, tcfg, xi, xv, y = _case(rng)
    calls = {"n": 0}

    def bug(it, **kw):
        calls["n"] += 1
        raise ValueError("a bug, not a device loss")

    monkeypatch.setattr(batching, "prefetch_to_device", bug)
    est = DeepFMEstimator(mcfg, tcfg)
    with pytest.raises(ValueError):
        fit_with_recovery(est, xi, xv, y, save_path=str(tmp_path / "ck"),
                          max_restarts=5)
    assert calls["n"] == 1
