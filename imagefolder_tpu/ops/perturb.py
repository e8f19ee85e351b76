"""RobustTok latent perturbation (reference ``latent_perturbation.py:4-35``).

With probability ``alpha``, replace each token's code with a uniformly random
one of its ``delta`` nearest codebook entries; apply only to the first
``floor(B*beta)`` samples; straight-through to the encoder. Applied AFTER the
vq/commit losses so it only perturbs rec/percep/GAN gradients
(reference ``xqgan_model.py:295-298``).

TPU notes: top-delta via ``jax.lax.top_k`` (static k), fp32 distance matmul on
the MXU, no data-dependent shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["add_perturbation"]


def add_perturbation(
    z_BHWC: jnp.ndarray,
    z_q_BHWC: jnp.ndarray,
    codebook_VC: jnp.ndarray,
    *,
    alpha,
    beta,
    delta: int,
    key: jax.Array,
    codebook_norm: bool = True,
    delta_eff=None,
) -> jnp.ndarray:
    """``delta`` is the static top-k budget (config value); ``alpha``/``beta``
    and the annealed effective ``delta_eff`` may be traced scalars, so the
    per-epoch RobustTok annealing (xqgan_train.py:429-432) never recompiles."""
    if delta <= 0:
        return z_q_BHWC
    if delta_eff is None:
        delta_eff = delta
    b, h, w, c = z_BHWC.shape
    z = z_BHWC.astype(jnp.float32)
    if codebook_norm:
        z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-12)
        emb = codebook_VC / (jnp.linalg.norm(codebook_VC, axis=-1, keepdims=True) + 1e-12)
    else:
        emb = codebook_VC
    flat = z.reshape(-1, c)
    d = (
        jnp.sum(jnp.square(flat), axis=-1, keepdims=True)
        + jnp.sum(jnp.square(emb), axis=-1)
        - 2.0 * jnp.dot(flat, emb.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
    )
    _, top_idx = jax.lax.top_k(-d, delta)  # (N, delta) nearest-first

    k_prob, k_idx = jax.random.split(key)
    n = flat.shape[0]
    rand_prob = jax.random.uniform(k_prob, (n,))
    d_eff = jnp.clip(jnp.asarray(delta_eff, jnp.float32), 1.0, float(delta))
    rand_idx = jnp.floor(jax.random.uniform(k_idx, (n,)) * d_eff).astype(jnp.int32)
    rand_idx = jnp.where(rand_prob > alpha, 0, rand_idx)
    chosen = jnp.take_along_axis(top_idx, rand_idx[:, None], axis=1)[:, 0]

    pq = jnp.take(codebook_VC, chosen, axis=0)
    if codebook_norm:
        pq = pq / (jnp.linalg.norm(pq, axis=-1, keepdims=True) + 1e-12)
    pq = pq.reshape(z.shape)
    pq = z + jax.lax.stop_gradient(pq - z)

    n_pert = jnp.floor(b * jnp.asarray(beta, jnp.float32))
    mask = (jnp.arange(b) < n_pert)[:, None, None, None]
    return jnp.where(mask, pq.astype(z_q_BHWC.dtype), z_q_BHWC)
