"""Metric parity vs sklearn (the reference's metric source)."""

import numpy as np
import pytest

from xsdeepfwfm_deprecated_tpu.train import metrics as M

sklearn = pytest.importorskip("sklearn")
from sklearn import metrics as SK  # noqa: E402


@pytest.fixture(params=[0, 1, 2])
def case(request, rng):
    n = [100, 1000, 3333][request.param]
    y = (rng.random(n) < 0.25).astype(np.float64)
    # include ties to exercise tie handling
    p = np.round(rng.random(n), 2)
    return y, p


def test_roc_auc(case):
    y, p = case
    assert M.roc_auc(y, p) == pytest.approx(SK.roc_auc_score(y, p), abs=1e-12)


def test_prauc(case):
    y, p = case
    prec, rec, _ = SK.precision_recall_curve(y, p)
    want = SK.auc(rec, prec)
    assert M.prauc(p, y) == pytest.approx(want, abs=1e-10)


def test_log_loss(case):
    y, p = case
    p = np.clip(p, 0.01, 0.99)
    assert M.log_loss(y, p) == pytest.approx(SK.log_loss(y, p), abs=1e-10)


def test_rce(case):
    y, p = case
    p = np.clip(p, 0.01, 0.99)
    ce = SK.log_loss(y, p)
    ctr = y.mean()
    straw = SK.log_loss(y, np.full_like(y, ctr))
    assert M.rce(p, y) == pytest.approx((1 - ce / straw) * 100, abs=1e-8)


def test_bce_logits_sum():
    y = np.array([0.0, 1.0, 1.0])
    logits = np.array([-2.0, 0.5, 3.0])
    p = 1 / (1 + np.exp(-logits))
    want = -np.sum(y * np.log(p) + (1 - y) * np.log(1 - p))
    assert M.bce_logits_sum(y, logits) == pytest.approx(want, abs=1e-10)
