"""Contrastive (InfoNCE) alignment loss (reference ``cliploss.py:66-130``).

Used for the semantic (DINOv2) and detail (CLIP) guides of the tokenizer.
The reference all-gathers features across DDP ranks with gradient
(``cliploss.py:19-63``); under pjit the batch axis is already global, so the
plain global-batch formulation below IS the gathered loss — XLA inserts the
collectives from the sharding. For explicit shard_map-style use, pass
``axis_name`` and features are gathered with gradient via
``jax.lax.all_gather`` (differentiable).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["clip_loss", "siglip_loss"]


def _xent(logits, labels):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def clip_loss(
    feats_a: jnp.ndarray,
    feats_b: jnp.ndarray,
    logit_scale,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """Symmetric InfoNCE between two (N, D) feature sets (N aligned pairs)."""
    a = feats_a.astype(jnp.float32)
    b = feats_b.astype(jnp.float32)
    if axis_name is not None:
        a = jax.lax.all_gather(a, axis_name, axis=0).reshape(-1, a.shape[-1])
        b = jax.lax.all_gather(b, axis_name, axis=0).reshape(-1, b.shape[-1])
    logits_ab = logit_scale * jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    labels = jnp.arange(a.shape[0])
    return 0.5 * (_xent(logits_ab, labels) + _xent(logits_ab.T, labels))


def siglip_loss(feats_a, feats_b, logit_scale, logit_bias=0.0):
    """Pairwise sigmoid loss (reference SigLipLoss, cliploss.py:306 — unused
    by the shipped configs but part of the API surface)."""
    a = feats_a.astype(jnp.float32)
    b = feats_b.astype(jnp.float32)
    logits = logit_scale * jnp.dot(a, b.T, preferred_element_type=jnp.float32) + logit_bias
    n = a.shape[0]
    labels = 2.0 * jnp.eye(n) - 1.0  # +1 diagonal, -1 off-diagonal
    return -jnp.mean(jax.nn.log_sigmoid(labels * logits)) * n
