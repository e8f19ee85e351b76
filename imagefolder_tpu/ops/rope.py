"""Rotary position embeddings for the ViT decoder's RoPE option
(reference ``dino_enc/vision_transformer.py:58-198``: learnable mixed-2D
rotary for image tokens + learnable 1D rotary for latent tokens).

Complex cis values are carried as (cos, sin) pairs (last axis 2) so they can
be ordinary fp32 flax params (torch stores complex parameters)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "init_1d_freqs", "init_2d_freqs", "init_t_xy", "compute_mixed_cis",
    "apply_rotary",
]


def init_1d_freqs(dim: int, end: int, theta: float = 10000.0) -> np.ndarray:
    """(end, dim//2, 2) cos/sin (vision_transformer.py:58-78)."""
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2)[: dim // 2] / dim))
    ang = np.outer(np.arange(end), freqs)
    return np.stack([np.cos(ang), np.sin(ang)], axis=-1).astype(np.float32)


def init_2d_freqs(dim: int, num_heads: int, theta: float = 10.0,
                  rotate: bool = True, seed: int = 0) -> np.ndarray:
    """(2, num_heads, dim//2) fx/fy magnitudes with random per-head rotation
    (vision_transformer.py:81-95)."""
    rng = np.random.default_rng(seed)
    mag = 1.0 / (theta ** (np.arange(0, dim, 4)[: dim // 4] / dim))
    fx, fy = [], []
    for _ in range(num_heads):
        a = rng.random() * 2 * math.pi if rotate else 0.0
        fx.append(np.concatenate([mag * math.cos(a),
                                  mag * math.cos(math.pi / 2 + a)], axis=-1))
        fy.append(np.concatenate([mag * math.sin(a),
                                  mag * math.sin(math.pi / 2 + a)], axis=-1))
    return np.stack([np.stack(fx), np.stack(fy)]).astype(np.float32)


def init_2d_freqs_jax(key, dim: int, num_heads: int, theta: float = 10.0,
                      rotate: bool = True):
    """jnp version of init_2d_freqs usable as a (traced) flax param init."""
    mag = 1.0 / (theta ** (jnp.arange(0, dim, 4)[: dim // 4] / dim))
    a = (jax.random.uniform(key, (num_heads, 1)) * 2 * math.pi
         if rotate else jnp.zeros((num_heads, 1)))
    fx = jnp.concatenate([mag * jnp.cos(a), mag * jnp.cos(math.pi / 2 + a)], -1)
    fy = jnp.concatenate([mag * jnp.sin(a), mag * jnp.sin(math.pi / 2 + a)], -1)
    return jnp.stack([fx, fy]).astype(jnp.float32)


def init_t_xy(end_x: int, end_y: int):
    t = np.arange(end_x * end_y, dtype=np.float32)
    return t % end_x, np.floor(t / end_x)


def compute_mixed_cis(freqs, t_x, t_y):
    """freqs (2, H, d/2), t (N,) -> (H, N, d/2, 2) cos/sin
    (vision_transformer.py:104-111)."""
    ang = (t_x[None, :, None] * freqs[0][:, None, :]
           + t_y[None, :, None] * freqs[1][:, None, :])  # (H, N, d/2)
    return jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1)


def apply_rotary(x, cis):
    """x: (B, N, H, hd); cis: (N, hd//2, 2) or (H, N, hd//2, 2). Pairs
    consecutive channels as complex (torch view_as_complex semantics)."""
    b, n, h, hd = x.shape
    xf = x.astype(jnp.float32).reshape(b, n, h, hd // 2, 2)
    xr, xi = xf[..., 0], xf[..., 1]
    if cis.ndim == 3:  # (N, d/2, 2) shared over heads
        cr = cis[None, :, None, :, 0]
        ci = cis[None, :, None, :, 1]
    else:  # (H, N, d/2, 2)
        cr = cis[..., 0].transpose(1, 0, 2)[None]  # (1, N, H, d/2)
        ci = cis[..., 1].transpose(1, 0, 2)[None]
    outr = xr * cr - xi * ci
    outi = xr * ci + xi * cr
    out = jnp.stack([outr, outi], axis=-1).reshape(b, n, h, hd)
    return out.astype(x.dtype)
