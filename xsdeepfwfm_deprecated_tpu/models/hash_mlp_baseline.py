"""Hashed-feature MLP baseline (counterpart of the reference ``baseline.py``).

The reference ships a Keras MLP baseline for the Twitter dataset: categorical
values are feature-hashed (mmh3) into a fixed-width space, concatenated with
the dense features, and fed to a small MLP with PRAUC/RCE metrics
(``baseline.py:86-145``). Not part of the core DeepLight path — bundled for
experiment parity.

This JAX version reproduces the structure framework-natively: multiplicative
hashing of (field, value) pairs into ``hash_dim`` buckets, bucket-count
featurization, dense concat, and the framework's train loop/metrics.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TrainConfig
from ..train import metrics as M


def hash_features(index: np.ndarray, hash_dim: int = 2048, seed: int = 0x9E3779B1
                  ) -> np.ndarray:
    """(N, C) int categorical indices → (N, hash_dim) float bucket counts.

    Fibonacci-style multiplicative hash of (field, value); the mmh3 stand-in
    (mmh3 is not a framework dependency).
    """
    n, c = index.shape
    fields = np.arange(c, dtype=np.uint64)[None, :]
    vals = index.astype(np.uint64)
    mixed = (vals * np.uint64(0x9E3779B97F4A7C15) ^ (fields + np.uint64(seed))
             * np.uint64(0xBF58476D1CE4E5B9))
    mixed ^= mixed >> np.uint64(31)
    buckets = (mixed % np.uint64(hash_dim)).astype(np.int64)
    out = np.zeros((n, hash_dim), np.float32)
    np.add.at(out, (np.arange(n)[:, None], buckets), 1.0)
    return out


def init_params(key: jax.Array, in_dim: int, hidden=(256, 128)) -> Dict:
    dims = [in_dim] + list(hidden) + [1]
    layers = []
    keys = jax.random.split(key, len(dims) - 1)
    for k, (fi, fo) in zip(keys, zip(dims[:-1], dims[1:])):
        glorot = (2.0 / (fi + fo)) ** 0.5
        kw, kb = jax.random.split(k)
        layers.append({"w": jax.random.normal(kw, (fi, fo)) * glorot,
                       "b": jax.random.normal(kb, (fo,)) * glorot})
    return {"layers": layers}


def forward(params: Dict, x: jax.Array) -> jax.Array:
    h = x
    for layer in params["layers"][:-1]:
        h = jax.nn.relu(h @ layer["w"] + layer["b"])
    out = h @ params["layers"][-1]["w"] + params["layers"][-1]["b"]
    return out[:, 0]


class HashMLPBaseline:
    """Minimal estimator: fit/predict/eval with PRAUC+RCE (reference
    ``baseline.py:86-102`` metric pair)."""

    def __init__(self, hash_dim: int = 2048, hidden=(256, 128),
                 train_cfg: Optional[TrainConfig] = None, logger=None):
        self.hash_dim = hash_dim
        self.hidden = hidden
        self.tcfg = train_cfg or TrainConfig(n_epochs=3, batch_size=1024,
                                             learning_rate=1e-3)
        self.params: Optional[Dict] = None
        from ..utils.logging import get_logger
        self.logger = logger or get_logger()

    def _featurize(self, index, value) -> np.ndarray:
        hashed = hash_features(np.asarray(index, np.int64), self.hash_dim)
        return np.concatenate([np.asarray(value, np.float32), hashed], axis=1)

    def fit(self, index, value, y):
        import optax
        x = self._featurize(index, value)
        y = np.asarray(y, np.float32).ravel()
        key = jax.random.PRNGKey(self.tcfg.random_seed)
        self.params = init_params(key, x.shape[1], self.hidden)
        opt = optax.adam(self.tcfg.learning_rate)
        opt_state = opt.init(self.params)

        @jax.jit
        def step(p, o, xb, yb):
            def loss_fn(p):
                logits = forward(p, xb)
                return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, yb))
            loss, g = jax.value_and_grad(loss_fn)(p)
            up, o = opt.update(g, o, p)
            return optax.apply_updates(p, up), o, loss

        bs = self.tcfg.batch_size
        rng = np.random.default_rng(self.tcfg.random_seed)
        for epoch in range(self.tcfg.n_epochs):
            perm = rng.permutation(len(y))
            total = 0.0
            for lo in range(0, len(y) - bs + 1, bs):
                sl = perm[lo:lo + bs]
                self.params, opt_state, loss = step(
                    self.params, opt_state, jnp.asarray(x[sl]), jnp.asarray(y[sl]))
                total += float(loss)
            self.logger.info(f"baseline epoch {epoch + 1} loss {total:.4f}")
        return self

    def predict_proba(self, index, value) -> np.ndarray:
        x = self._featurize(index, value)
        logits = np.asarray(jax.jit(forward)(self.params, jnp.asarray(x)))
        return 1.0 / (1.0 + np.exp(-logits.astype(np.float64)))

    def evaluate(self, index, value, y) -> Tuple[float, float, float]:
        p = self.predict_proba(index, value)
        y = np.asarray(y, np.float64).ravel()
        return M.roc_auc(y, p), M.prauc(p, y), M.rce(p, y)
