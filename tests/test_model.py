"""Model-level tests: every flag combination builds, forwards, and matches the
reference's compositional math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xsdeepfwfm_deprecated_tpu.config import ModelConfig
from xsdeepfwfm_deprecated_tpu.models import deepfwfm

F_SIZES = (1, 1, 1, 5, 9, 30)
NUM = 3
B = 8


def mk_cfg(**kw):
    base = dict(field_size=6, feature_sizes=F_SIZES, numerical=NUM, embedding_size=4,
                h_depth=2, deep_nodes=16,
                use_logit=False, use_fm=False, use_ffm=False, use_fwfm=False,
                use_deep=False)
    base.update(kw)
    return ModelConfig(**base)


@pytest.fixture(scope="module")
def batch(rng):
    xi = rng.integers(0, [5, 9, 30], size=(B, 3)).astype(np.int32)
    xv = rng.normal(size=(B, NUM)).astype(np.float32)
    return jnp.asarray(xi), jnp.asarray(xv)


ALL_VARIANTS = [
    dict(use_logit=True),                                       # LR
    dict(use_fm=True),                                          # FM
    dict(use_fwfm=True),                                        # FwFM
    dict(use_ffm=True),                                         # FFM
    dict(use_fm=True, use_deep=True),                           # DeepFM
    dict(use_fwfm=True, use_deep=True),                         # DeepFwFM
    dict(use_ffm=True, use_deep=True),                          # DeepFFM
    dict(use_deep=True),                                        # deep-only
    dict(use_fwfm=True, use_deep=True, use_lw=True),            # + lw
    dict(use_fwfm=True, use_deep=True, use_fwlw=True),          # + fwlw
    dict(use_fwfm=True, use_deep=True, use_lw=True, use_fwlw=True),
    dict(use_fwfm=True, use_deep=True, qr_flag=True, qr_threshold=8),  # QR
    dict(use_fwfm=True, use_deep=True, num_deeps=2),
]


@pytest.mark.parametrize("flags", ALL_VARIANTS)
def test_variant_forward(flags, batch):
    cfg = mk_cfg(**flags)
    params = deepfwfm.init_params(jax.random.PRNGKey(0), cfg)
    xi, xv = batch
    logits = deepfwfm.forward(params, xi, xv, cfg)
    assert logits.shape == (B,)
    assert np.all(np.isfinite(np.asarray(logits)))
    # train-mode with dropout rng also works
    logits_t = deepfwfm.forward(params, xi, xv, cfg, train=True,
                                rng=jax.random.PRNGKey(1))
    assert logits_t.shape == (B,)
    # jit-compilable
    f = jax.jit(lambda p, a, b: deepfwfm.forward(p, a, b, cfg))
    np.testing.assert_allclose(np.asarray(f(params, xi, xv)), np.asarray(logits),
                               rtol=1e-5, atol=1e-5)


def test_mutual_exclusion():
    with pytest.raises(ValueError):
        mk_cfg(use_fm=True, use_fwfm=True)
    with pytest.raises(ValueError):
        mk_cfg()  # nothing selected


def test_lr_equals_manual(batch):
    """LR logit = Σ_f w_f(x_f) + bias, numeric scaled by value."""
    cfg = mk_cfg(use_logit=True)
    params = deepfwfm.init_params(jax.random.PRNGKey(0), cfg)
    xi, xv = batch
    logits = np.asarray(deepfwfm.forward(params, xi, xv, cfg))
    table = np.asarray(params["emb1"]["dense"])[:, 0]
    offs = np.concatenate([[0], np.cumsum(F_SIZES)[:-1]])
    want = np.full(B, 0.01, np.float64)
    for f in range(6):
        if f < NUM:
            want += table[offs[f]] * np.asarray(xv)[:, f]
        else:
            want += table[offs[f] + np.asarray(xi)[:, f - NUM]]
    np.testing.assert_allclose(logits, want, rtol=1e-5, atol=1e-5)


def test_deepfwfm_is_sum_of_terms(batch):
    """DeepFwFM logit = 1st + 2nd + deep + bias (reference :458)."""
    cfg = mk_cfg(use_fwfm=True, use_deep=True)
    params = deepfwfm.init_params(jax.random.PRNGKey(0), cfg)
    xi, xv = batch
    total = np.asarray(deepfwfm.forward(params, xi, xv, cfg))

    cfg_fwfm = mk_cfg(use_fwfm=True)
    fwfm_only = np.asarray(deepfwfm.forward(params, xi, xv, cfg_fwfm))

    # deep-only contribution with the same emb2/deep params
    from xsdeepfwfm_deprecated_tpu.ops import embedding as emb_ops, mlp as mlp_ops
    spec = deepfwfm.make_embedding_spec(cfg)
    emb2 = emb_ops.packed_lookup(params["emb2"], spec, xi, xv)
    x_deep = mlp_ops.mlp_forward(params["deep"]["net_1"], emb2.reshape(B, -1),
                                 dropout_rates=(0, 0, 0), train=False)
    want = fwfm_only + np.asarray(x_deep).sum(1)
    np.testing.assert_allclose(total, want, rtol=1e-4, atol=1e-5)


def test_param_counts():
    cfg = mk_cfg(use_fwfm=True, use_deep=True, use_lw=True, use_fwlw=True)
    params = deepfwfm.init_params(jax.random.PRNGKey(0), cfg)
    counts = deepfwfm.param_group_counts(params, cfg)
    total_rows = sum(F_SIZES)
    assert counts["second_order_embeddings"] == total_rows * 4
    assert counts["first_order_embeddings"] == 0  # fwlw replaces emb1
    # dnn: (6*4)->16->16 + biases (fc + lw + fwlw + field_cov excluded from dnn group)
    assert counts["dnn"] == 24 * 16 + 16 + 16 * 16 + 16
    assert counts["total"] == deepfwfm.param_count(params)


def test_init_distributions():
    """2nd-order scale 0.01, 1st-order scale 1 (reference :479-481)."""
    cfg = mk_cfg(use_fwfm=True, use_deep=True)
    big_sizes = tuple([1] * 3 + [2000, 2000, 2000])
    cfg = ModelConfig(**{**cfg.__dict__, "feature_sizes": big_sizes})
    params = deepfwfm.init_params(jax.random.PRNGKey(0), cfg)
    std2 = float(np.asarray(params["emb2"]["dense"]).std())
    assert 0.008 < std2 < 0.012
    std1 = float(np.asarray(params["emb1"]["dense"]).std())
    assert 0.9 < std1 < 1.1
    stdR = float(np.asarray(params["field_cov"]).std())
    assert abs(stdR - (2.0 / 6 / 2) ** 0.5) < 0.1
