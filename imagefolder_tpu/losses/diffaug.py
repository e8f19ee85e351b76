"""StyleGAN-T differentiable augmentation (reference ``diffaug.py:23-118``).

Translation (±12.5% with clamped 1-px-padded gather), color jitter
(brightness/saturation/contrast), cutout (0.2), plus the warm-up Gaussian
blur used by DinoDisc early in training.

TPU-first: the reference branches on host-side ``torch.rand(3)`` per batch;
here the three aug switches are traced Bernoullis applied via ``jnp.where``
(same distribution, no recompile, no host sync). NHWC layout.

The ``*_with_u`` functions take the uniform draws explicitly (shape (B,1,1)
or (B,1,1,1) in [0,1)) — they are the exact math of the reference's branches
given its ``rand01 = torch.rand(7, B, 1, 1)`` tensor, and are golden-tested
against it with shared uniforms (tests/test_losses.py)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = ["diff_aug", "warmup_blur", "translate_with_u", "color_with_u",
           "cutout_with_u"]


def warmup_blur(x_BHWC, blur_schedule: float):
    """Gaussian warm-up blur (diffaug.py:46-67); ``blur_schedule`` is a static
    python float (annealed per epoch — negligible recompiles)."""
    if blur_schedule <= 0:
        return x_BHWC
    h = x_BHWC.shape[1]
    sigma = (h * 0.5) ** 0.5 * blur_schedule
    radius = math.floor(sigma * 3)
    if radius < 1:
        return x_BHWC
    g = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    g = jnp.exp2(-jnp.square(g / sigma))
    g = g / jnp.sum(g)
    x = jnp.pad(x_BHWC, ((0, 0), (radius, radius), (radius, radius), (0, 0)),
                mode="reflect")
    # separable depthwise blur via conv with feature_group_count
    c = x.shape[-1]
    kh = jnp.tile(g.reshape(-1, 1, 1, 1), (1, 1, 1, c))  # (K,1,1,C)
    kw = jnp.tile(g.reshape(1, -1, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID", dimension_numbers=dn,
                                     feature_group_count=c)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID", dimension_numbers=dn,
                                     feature_group_count=c)
    return x


def translate_with_u(x, u_h, u_w, ratio=0.125):
    """diffaug.py:84-97 given rand01[0]=u_h, rand01[1]=u_w ((B,1,1) each)."""
    b, h, w, c = x.shape
    dh, dw = round(h * ratio), round(w * ratio)
    th = jnp.floor(u_h * (2 * dh + 1)).astype(jnp.int32) - dh
    tw = jnp.floor(u_w * (2 * dw + 1)).astype(jnp.int32) - dw
    gh = jnp.clip(jnp.arange(h)[None, :, None] + th + 1, 0, h + 1)  # (B,H,1)
    gw = jnp.clip(jnp.arange(w)[None, None, :] + tw + 1, 0, w + 1)  # (B,1,W)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # gather rows then cols (same as the reference's fancy-index gather);
    # take_along_axis broadcasts the size-1 dims
    xp = jnp.take_along_axis(xp, gh[:, :, :, None].astype(jnp.int32), axis=1)
    xp = jnp.take_along_axis(xp, gw[:, :, :, None].astype(jnp.int32), axis=2)
    return xp


def color_with_u(x, r2, r3, r4):
    """diffaug.py:99-107 given rand01[2:5] ((B,1,1,1) each)."""
    x = x + (r2 - 0.5)                       # brightness
    mean_c = jnp.mean(x, axis=-1, keepdims=True)
    x = (x - mean_c) * (r3 * 2.0) + mean_c   # saturation (channel mean)
    mean_all = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    x = (x - mean_all) * (r4 + 0.5) + mean_all  # contrast
    return x


def cutout_with_u(x, u5, u6, ratio=0.2):
    """diffaug.py:109-121 given rand01[5]=u5, rand01[6]=u6 ((B,1,1) each)."""
    b, h, w, c = x.shape
    ch, cw = round(h * ratio), round(w * ratio)
    oh = jnp.floor(u5 * (h + (1 - ch % 2))).astype(jnp.int32)
    ow = jnp.floor(u6 * (w + (1 - cw % 2))).astype(jnp.int32)
    gh = jnp.clip(jnp.arange(ch)[None, :, None] + oh - ch // 2, 0, h - 1)  # (B,ch,1)
    gw = jnp.clip(jnp.arange(cw)[None, None, :] + ow - cw // 2, 0, w - 1)  # (B,1,cw)
    mask = jnp.ones((b, h, w), x.dtype)
    bidx = jnp.arange(b)[:, None, None]
    mask = mask.at[bidx, gh, gw].set(0.0)
    return x * mask[..., None]


def _translate(x, key, ratio=0.125):
    b = x.shape[0]
    k1, k2 = jax.random.split(key)
    return translate_with_u(x, jax.random.uniform(k1, (b, 1, 1)),
                            jax.random.uniform(k2, (b, 1, 1)), ratio)


def _color(x, key):
    k2, k3, k4 = jax.random.split(key, 3)
    b = x.shape[0]
    return color_with_u(x, jax.random.uniform(k2, (b, 1, 1, 1)),
                        jax.random.uniform(k3, (b, 1, 1, 1)),
                        jax.random.uniform(k4, (b, 1, 1, 1)))


def _cutout(x, key, ratio=0.2):
    b = x.shape[0]
    k5, k6 = jax.random.split(key)
    return cutout_with_u(x, jax.random.uniform(k5, (b, 1, 1)),
                         jax.random.uniform(k6, (b, 1, 1)), ratio)


def diff_aug(x_BHWC, key, prob: float = 1.0, cutout: float = 0.2,
             blur_schedule: float = 0.0):
    """Apply warm-up blur + {translation, color, cutout}, each gated by an
    independent Bernoulli(prob) per batch (reference draws these on host)."""
    x = x_BHWC.astype(jnp.float32)
    x = warmup_blur(x, blur_schedule)
    if prob < 1e-6:
        return x
    kg, kt, kc, ku = jax.random.split(key, 4)
    gates = jax.random.uniform(kg, (3,)) <= prob
    x = jnp.where(gates[0], _translate(x, kt), x)
    x = jnp.where(gates[1], _color(x, kc), x)
    if cutout > 0:
        x = jnp.where(gates[2], _cutout(x, ku, cutout), x)
    return x
