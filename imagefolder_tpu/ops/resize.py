"""Torch-parity image resizing as separable matrix multiplies.

The reference tokenizer pipeline leans on ``F.interpolate`` with three modes
(see reference ``tokenizer/tokenizer_image/quant.py:91,107`` — ``area`` for
pooling residuals down to a scale, ``bicubic`` for upsampling code maps back
to full resolution, and ``nearest`` 2x in the CNN decoder upsample,
``xqgan_model.py:683``). Reproducing the published checkpoints bit-for-bit
requires these to match PyTorch's sampling semantics exactly.

TPU-first design: all source/target sizes are static (they come from
``v_patch_nums``), so each resize is a fixed linear map. We precompute the
(out, in) interpolation matrix per axis on the host with float64 accuracy and
apply it as two small einsums — XLA maps these onto the MXU and fuses them
with neighbouring ops, avoiding data-dependent gathers entirely.

All functions take NHWC arrays (TPU-native layout).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resize", "resize_matrix"]

_A = -0.75  # torch's bicubic coefficient (cubic convolution, Keys 1981)


def _cubic_w1(t: np.ndarray) -> np.ndarray:
    # weight for the two inner taps, |offset| = t in [0, 1]
    return ((_A + 2.0) * t - (_A + 3.0)) * t * t + 1.0


def _cubic_w0(t: np.ndarray) -> np.ndarray:
    # weight for the two outer taps, offset = t + 1 in [1, 2]
    return ((_A * (t + 1.0) - 5.0 * _A) * (t + 1.0) + 8.0 * _A) * (t + 1.0) - 4.0 * _A


def _bicubic_matrix(out_size: int, in_size: int) -> np.ndarray:
    """Row-stochastic (out,in) matrix matching torch bicubic, align_corners=False,
    antialias=False (torch clamps out-of-range taps to the border)."""
    m = np.zeros((out_size, in_size), dtype=np.float64)
    scale = in_size / out_size
    for o in range(out_size):
        src = (o + 0.5) * scale - 0.5
        f = int(np.floor(src))
        t = src - f
        ws = (_cubic_w0(np.float64(t)), _cubic_w1(np.float64(t)),
              _cubic_w1(np.float64(1.0 - t)), _cubic_w0(np.float64(1.0 - t)))
        for k, w in enumerate(ws):
            idx = min(max(f - 1 + k, 0), in_size - 1)
            m[o, idx] += w
    return m


def _area_matrix(out_size: int, in_size: int) -> np.ndarray:
    """(out,in) matrix matching torch mode='area' (= adaptive average pooling:
    output cell o averages input rows [floor(o*in/out), ceil((o+1)*in/out))."""
    m = np.zeros((out_size, in_size), dtype=np.float64)
    for o in range(out_size):
        start = (o * in_size) // out_size
        end = -((-(o + 1) * in_size) // out_size)  # ceil div
        m[o, start:end] = 1.0 / (end - start)
    return m


def _nearest_matrix(out_size: int, in_size: int) -> np.ndarray:
    """(out,in) matrix matching torch legacy mode='nearest': src = floor(o*in/out)."""
    m = np.zeros((out_size, in_size), dtype=np.float64)
    for o in range(out_size):
        src = min(int(o * in_size / out_size), in_size - 1)
        m[o, src] = 1.0
    return m


_A_AA = -0.5  # antialias path uses PIL's bicubic coefficient, not -0.75


def _cubic_kernel(x: np.ndarray, a: float = _A_AA) -> np.ndarray:
    x = np.abs(x)
    out = np.where(
        x < 1.0,
        ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
        np.where(x < 2.0, ((a * x - 5.0 * a) * x + 8.0 * a) * x - 4.0 * a, 0.0),
    )
    return out


def _bicubic_aa_matrix(out_size: int, in_size: int) -> np.ndarray:
    """torch bicubic with antialias=True (the timm resample_abs_pos_embed
    path). PIL-style separable resampling: kernel support scaled by the
    downsample factor, truncated integer window, weights normalized to 1."""
    scale = in_size / out_size
    inv = 1.0 / max(scale, 1.0)
    support = 2.0 * max(scale, 1.0)
    m = np.zeros((out_size, in_size), dtype=np.float64)
    for o in range(out_size):
        center = (o + 0.5) * scale
        lo = max(int(center - support + 0.5), 0)
        hi = min(int(center + support + 0.5), in_size)
        j = np.arange(lo, hi)
        w = _cubic_kernel((j - center + 0.5) * inv)
        s = w.sum()
        if s != 0:
            w = w / s
        m[o, lo:hi] = w
    return m


_MODES = {
    "bicubic": _bicubic_matrix,
    "bicubic_aa": _bicubic_aa_matrix,
    "area": _area_matrix,
    "nearest": _nearest_matrix,
}


@functools.lru_cache(maxsize=None)
def resize_matrix(out_size: int, in_size: int, mode: str) -> np.ndarray:
    """Cached float32 (out,in) interpolation matrix for one axis."""
    if mode not in _MODES:
        raise ValueError(f"unknown resize mode {mode!r}; options: {sorted(_MODES)}")
    return np.ascontiguousarray(_MODES[mode](out_size, in_size), dtype=np.float32)


def resize(x: jnp.ndarray, size: tuple[int, int], mode: str = "bicubic") -> jnp.ndarray:
    """Resize NHWC (or HWC) ``x`` to spatial ``size`` with torch-interpolate parity.

    Identity sizes short-circuit. Computation runs in the input dtype's
    promotion with float32 weights (quantizer paths call this in fp32).
    """
    out_h, out_w = size
    in_h, in_w = x.shape[-3], x.shape[-2]
    if (in_h, in_w) == (out_h, out_w):
        return x
    dtype = x.dtype
    wh = jnp.asarray(resize_matrix(out_h, in_h, mode))
    ww = jnp.asarray(resize_matrix(out_w, in_w, mode))
    # precision=highest: TPU's default bf16 matmul would break torch parity
    # (and hence code-index reproducibility) on the quantizer path.
    y = jnp.einsum("oh,...hwc->...owc", wh, x.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("pw,...owc->...opc", ww, y,
                   precision=jax.lax.Precision.HIGHEST)
    return y.astype(dtype)
