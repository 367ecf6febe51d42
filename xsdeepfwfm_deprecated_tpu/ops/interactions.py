"""Pairwise-interaction ops: FM, FwFM, FFM — contraction forms that never
materialize the reference's ``(F, F, B, E)`` outer-product tensor.

Reference math (``model/DeepFMs.py:350-367``):

* ``outer_fm[k,l,b,e] = E[b,k,e]·E[b,l,e]`` — its single biggest tensor.
* FM second order  = ``(ΣΣ_kl outer − Σ_k outer[k,k]) · 0.5`` → (B, E)
* FwFM second order = same with outer scaled by the symmetrized field matrix
  ``R_sym = (R + Rᵀ)/2``.

TPU-native forms (identical results, O(B·F·E) / O(B·F²·E) FLOPs, no F²·B·E
intermediate):

* FM: sum-of-squares identity ``0.5·((Σ_k e_k)² − Σ_k e_k²)``.
* FwFM: ``0.5·(Σ_k e_k ⊙ (R_sym e)_k − Σ_k R_sym[k,k]·e_k²)`` where
  ``(R_sym e)[b,k,e] = Σ_l R_sym[k,l] E[b,l,e]`` is one MXU matmul over the
  field axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fm_second_order(emb: jax.Array) -> jax.Array:
    """(B, F, E) → (B, E). Sum-of-squares FM interaction.

    Equal to the reference's ``(ΣΣ outer − Σ diag)·0.5`` (``model/DeepFMs.py:354-355``).
    """
    s = jnp.sum(emb, axis=1)
    sq = jnp.sum(emb * emb, axis=1)
    return 0.5 * (s * s - sq)


def symmetrize(r: jax.Array) -> jax.Array:
    """R_sym = (R + Rᵀ)/2 (reference ``model/DeepFMs.py:363-364``)."""
    return 0.5 * (r + r.T)


def fwfm_second_order(emb: jax.Array, r: jax.Array) -> jax.Array:
    """(B, F, E), (F, F) → (B, E). Field-weighted FM interaction.

    ``0.5·(Σ_{k,l} R_sym[k,l] e_k e_l − Σ_k R_sym[k,k] e_k²)`` — one batched
    matmul over the field axis plus elementwise ops; matches the reference's
    einsum chain (``model/DeepFMs.py:362-367``) without the (F,F,B,E) tensor.
    """
    r_sym = symmetrize(r)
    # m[b,k,e] = Σ_l R_sym[k,l]·emb[b,l,e]  (MXU contraction over F)
    m = jnp.einsum("kl,ble->bke", r_sym, emb, precision="highest", preferred_element_type=jnp.float32)
    pair = jnp.sum(emb * m, axis=1)                       # Σ_{k,l} R_kl e_k e_l
    diag = jnp.sum(jnp.diag(r_sym)[None, :, None] * emb * emb, axis=1)
    return 0.5 * (pair - diag)


def fwfm_linear_term(emb: jax.Array, w: jax.Array) -> jax.Array:
    """FwLW linear term from 2nd-order embeddings: (B,F,E),(F,E) → (B,F).

    Reference: ``einsum('ijk,ik->ijk')`` then ``einsum('ijk->ji')``
    (``model/DeepFMs.py:342-345``) = Σ_e E[b,f,e]·W[f,e].
    """
    return jnp.einsum("bfe,fe->bf", emb, w, precision="highest", preferred_element_type=jnp.float32)


def ffm_second_order(emb_pairs: jax.Array) -> jax.Array:
    """FFM interaction: (B, F, F, E) → (B, E).

    ``emb_pairs[b,i,j] = table_i[x_i][j]`` (field i's embedding specialized for
    field j). Result ``Σ_{i<j} e_{i,j} ⊙ e_{j,i}`` matching the reference's
    pair loop (``model/DeepFMs.py:384-388``).
    """
    f = emb_pairs.shape[1]
    prod = emb_pairs * jnp.swapaxes(emb_pairs, 1, 2)      # [b,i,j] = e_{i,j}·e_{j,i}
    iu = jnp.triu(jnp.ones((f, f), dtype=emb_pairs.dtype), k=1)
    return jnp.einsum("bije,ij->be", prod, iu, precision="highest", preferred_element_type=jnp.float32)
