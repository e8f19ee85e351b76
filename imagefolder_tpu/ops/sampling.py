"""Token sampling helpers (reference ``models/helpers.py:6-38``).

top-k / top-p filtered categorical sampling and gumbel-softmax, as pure
functions with explicit PRNG keys. Static shapes (top-k via full mask, never
gather-to-smaller).

TPU note: the obvious filter (``lax.top_k`` + ``sort`` + double ``argsort``)
runs FOUR full vocab sorts per call — sorts are VPU-serial on TPU and made
the whole VAR 10-stage CFG decode batch-linear (~25 img/s flat across
B=8..64, measured round 5). Both cutoffs are plain order statistics, so we
recover them with a monotone binary search on the float32 bit lattice
instead: 32 fused compare-reduce passes, no sorts, no gathers. Thresholds
are EXACT (the search converges to the k-th largest value itself / the
largest representable nucleus bound), so the kept set matches the sorted
implementation everywhere except exact value ties, where the reference's
arbitrary sort order is itself undefined."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["top_k_top_p_filter", "sample_with_top_k_top_p", "gumbel_softmax"]


def _ordered_bits(x: jnp.ndarray) -> jnp.ndarray:
    """Map float32 -> uint32 such that float order == unsigned int order
    (finite values; -inf/+inf order correctly, NaN unused here)."""
    u = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    flip = jnp.where(u >= jnp.uint32(0x80000000),
                     jnp.uint32(0xFFFFFFFF), jnp.uint32(0x80000000))
    return u ^ flip


def _largest_threshold(keys: jnp.ndarray, pred_ok) -> jnp.ndarray:
    """Largest uint32 t (per row, shape keys.shape[:-1] + (1,)) with
    pred_ok(t) true, where pred_ok is monotone non-increasing in t and
    pred_ok(0) is true. Bit-by-bit descent: 32 compare-reduce passes."""
    t = jnp.zeros(keys.shape[:-1] + (1,), jnp.uint32)
    for bit in range(31, -1, -1):
        cand = t | jnp.uint32(1 << bit)
        t = jnp.where(pred_ok(cand), cand, t)
    return t


def top_k_top_p_filter(logits_BlV: jnp.ndarray, top_k: int = 0, top_p: float = 0.0):
    """Mask logits outside top-k / nucleus top-p with -inf (helpers.py:8-15).

    Sort-free: per-row thresholds via `_largest_threshold`. top-k keeps
    ``logits >= kth-largest-value`` (the reference's ``logits < kth`` removal,
    helpers.py:10); top-p removes the ascending-cumulative tail with mass
    <= 1-top_p (helpers.py:11-15), always keeping the row argmax."""
    logits = logits_BlV.astype(jnp.float32)
    # clamp to the vocab size: the reference CLIs default top_k=900 assuming
    # V=4096 (inference.py:32); small vocabularies must degrade to a no-op
    # filter, not crash (top_k is static, so this stays shape-stable)
    top_k = min(top_k, logits.shape[-1])
    if 0 < top_k < logits.shape[-1]:
        keys = _ordered_bits(logits)
        # kth largest value = largest t with count(keys >= t) >= k
        kth = _largest_threshold(
            keys, lambda t: jnp.sum(keys >= t, axis=-1, keepdims=True) >= top_k)
        logits = jnp.where(keys < kth, -jnp.inf, logits)
    if top_p > 0:
        probs = jax.nn.softmax(logits, axis=-1)
        pkeys = _ordered_bits(probs)
        # a token is removed iff the total mass at-or-below its probability
        # is <= 1-top_p (== the ascending-sorted cumsum test). The boundary
        # is the largest t with mass(pkeys <= t) <= 1-top_p.
        bound = _largest_threshold(
            pkeys,
            lambda t: jnp.sum(jnp.where(pkeys <= t, probs, 0.0), axis=-1,
                              keepdims=True) <= (1.0 - top_p))
        remove = pkeys <= bound
        # keep the largest logit always (ref keeps last sorted position)
        amax = jnp.argmax(logits, axis=-1, keepdims=True)
        remove = remove & (jnp.arange(logits.shape[-1]) != amax)
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
