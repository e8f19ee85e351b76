"""PSNR / SSIM reconstruction metrics (reference
``tokenizer/vqgan/reconstruction_vqgan_ddp.py:166-196`` uses skimage).

SSIM follows skimage's default for (0,1)-range float images with
gaussian_weights=False: 7x7 uniform window, C1=(0.01*R)^2, C2=(0.03*R)^2,
computed per channel and averaged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["psnr", "ssim"]


def psnr(a, b, data_range: float = 1.0):
    """Per-image PSNR over NHWC batches."""
    mse = jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)),
                   axis=(1, 2, 3))
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


def _uniform_filter(x, size=7):
    k = jnp.ones((size, size, 1, 1), x.dtype) / (size * size)
    c = x.shape[-1]
    k = jnp.tile(k, (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, k, (1, 1), "VALID",
                                        dimension_numbers=dn,
                                        feature_group_count=c)


def ssim(a, b, data_range: float = 1.0, win_size: int = 7):
    """Per-image SSIM (skimage structural_similarity parity, uniform window,
    per-channel mean). NHWC in [0, data_range]."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    n = win_size * win_size
    cov_norm = n / (n - 1)  # skimage sample covariance
    ua = _uniform_filter(a, win_size)
    ub = _uniform_filter(b, win_size)
    uaa = _uniform_filter(a * a, win_size)
    ubb = _uniform_filter(b * b, win_size)
    uab = _uniform_filter(a * b, win_size)
    va = cov_norm * (uaa - ua * ua)
    vb = cov_norm * (ubb - ub * ub)
    vab = cov_norm * (uab - ua * ub)
    s = ((2 * ua * ub + c1) * (2 * vab + c2)) / (
        (ua ** 2 + ub ** 2 + c1) * (va + vb + c2))
    return jnp.mean(s, axis=(1, 2, 3))
