"""Knowledge distillation: teacher-logit caching + the DeepLight KD loss.

Reference semantics (``model/DeepFMs.py:1030-1064`` and ``kd.py``):

* teacher logits are precomputed for the full (current-permutation) train set
  once per epoch under eval mode (``fetch_teacher_outputs``);
* KD loss = ``KLDiv(log_softmax(student/T), softmax(teacher/T)) · α·T² +
  BCE_with_logits(student, y) · (1−α)`` with α=0.9, T=20, and — faithfully to
  the reference — the softmax taken over the **batch** dimension (the logits
  are 1-D) and the KLDiv reduced by elementwise mean.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def kd_loss(student_logits: jax.Array, teacher_logits: jax.Array, y: jax.Array,
            mask: jax.Array, *, alpha: float = 0.9, temperature: float = 20.0) -> jax.Array:
    """Masked KD loss over a (possibly padded) batch of 1-D logits."""
    t = temperature
    neg_inf = jnp.asarray(-1e30, student_logits.dtype)
    s = jnp.where(mask > 0, student_logits / t, neg_inf)
    te = jnp.where(mask > 0, teacher_logits / t, neg_inf)
    log_p_s = jax.nn.log_softmax(s, axis=0)
    p_t = jax.nn.softmax(te, axis=0)
    # torch nn.KLDivLoss() default: elementwise mean of p_t·(log p_t − log p_s)
    log_p_t = jax.nn.log_softmax(te, axis=0)
    kl_elem = jnp.where(mask > 0, p_t * (log_p_t - log_p_s), 0.0)
    n_valid = jnp.maximum(jnp.sum(mask), 1.0)
    kl = jnp.sum(kl_elem) / n_valid

    bce_elem = optax.sigmoid_binary_cross_entropy(student_logits, y)
    bce = jnp.sum(bce_elem * mask) / n_valid
    return kl * (alpha * t * t) + bce * (1.0 - alpha)
