"""Token sampling helpers (reference ``models/helpers.py:6-38``).

top-k / top-p filtered categorical sampling and gumbel-softmax, as pure
functions with explicit PRNG keys. Static shapes (top-k via full mask, never
gather-to-smaller)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["top_k_top_p_filter", "sample_with_top_k_top_p", "gumbel_softmax"]


def top_k_top_p_filter(logits_BlV: jnp.ndarray, top_k: int = 0, top_p: float = 0.0):
    """Mask logits outside top-k / nucleus top-p with -inf (helpers.py:8-15)."""
    logits = logits_BlV.astype(jnp.float32)
    # clamp to the vocab size: the reference CLIs default top_k=900 assuming
    # V=4096 (inference.py:32); small vocabularies must degrade to a no-op
    # filter, not crash (top_k is static, so this stays shape-stable)
    top_k = min(top_k, logits.shape[-1])
    if 0 < top_k < logits.shape[-1]:
        kth = jnp.min(jax.lax.top_k(logits, top_k)[0], axis=-1, keepdims=True)
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p > 0:
        sorted_logits = jnp.sort(logits, axis=-1)  # ascending, like torch ref
        cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
        remove_sorted = cum <= (1.0 - top_p)
        # map back: a logit is removed if its rank-position is removed
        ranks = jnp.argsort(jnp.argsort(logits, axis=-1), axis=-1)
        remove = jnp.take_along_axis(remove_sorted, ranks, axis=-1)
        # keep the largest logit always (ref keeps last sorted position)
        remove = remove & (ranks != logits.shape[-1] - 1)
        logits = jnp.where(remove, -jnp.inf, logits)
    return logits


def sample_with_top_k_top_p(logits_BlV, key, top_k: int = 0, top_p: float = 0.0,
                            return_p: bool = False):
    """Categorical sample from filtered logits; returns (B, l) indices
    (or the filtered softmax if return_p, for PQ joint sampling)."""
    logits = top_k_top_p_filter(logits_BlV, top_k, top_p)
    if return_p:
        return jax.nn.softmax(logits, axis=-1)
    return jax.random.categorical(key, logits, axis=-1)


def gumbel_softmax(logits, key, tau: float = 1.0, hard: bool = False, g=None):
    """Gumbel-softmax (helpers.py:25-40). ``g`` injects explicit gumbel
    noise (golden tests share it with the torch reference); otherwise it is
    drawn from ``key``."""
    if g is None:
        g = jax.random.gumbel(key, logits.shape)
    y = jax.nn.softmax((logits + g) / tau, axis=-1)
    if hard:
        idx = jnp.argmax(y, axis=-1)
        y_hard = jax.nn.one_hot(idx, logits.shape[-1], dtype=y.dtype)
        y = y_hard - jax.lax.stop_gradient(y) + y
    return y
