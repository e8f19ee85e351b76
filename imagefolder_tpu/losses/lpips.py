"""LPIPS perceptual loss (reference ``tokenizer/tokenizer_image/lpips.py``).

VGG16 feature stack (taps after relu1_2/2_2/3_3/4_3/5_3) + input scaling layer
+ per-layer 1x1 linear heads; channel-unit-normalized squared feature diffs,
spatially averaged, summed over layers.

Weights come from the reference's ``vgg.pth`` checkpoint via
``convert_lpips_checkpoint`` (no torchvision/network needed at runtime). The
module is frozen (optimizer labels); it is architecture-exact so converted
weights reproduce the torch metric.

Layout: NHWC in [-1, 1].
"""

from __future__ import annotations

from typing import Mapping

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

__all__ = ["LPIPS", "convert_lpips_checkpoint"]

# torchvision VGG16 "features" conv indices and channels
_VGG_CFG = [
    (0, 64), (2, 64), (5, 128), (7, 128), (10, 256), (12, 256), (14, 256),
    (17, 512), (19, 512), (21, 512), (24, 512), (26, 512), (28, 512),
]
_POOL_BEFORE = {5, 10, 17, 24}   # maxpool precedes these conv indices
_TAP_AFTER = {3: 0, 8: 1, 15: 2, 22: 3, 29: 4}  # relu indices -> tap slot
_LIN_CHANNELS = [64, 128, 256, 512, 512]

_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


class LPIPS(nn.Module):
    """``dtype`` is the VGG-stack compute dtype. The reference runs LPIPS
    inside ``autocast(bf16)`` by default (xqgan_train.py:118,419,449), so
    ``bfloat16`` here is the parity-faithful *training* setting (and rides
    the MXU at full rate); the metric-sensitive tail — channel-unit
    normalization, squared diff, linear heads — always runs fp32."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        """x, y: NHWC images in [-1, 1]. Returns per-sample LPIPS (B, 1, 1, 1)."""
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)

        def scaled(t):
            return ((t.astype(jnp.float32) - shift) / scale).astype(self.dtype)

        feats_x, feats_y = [], []
        hx, hy = scaled(x), scaled(y)
        relu_idx = 0
        for conv_idx, ch in _VGG_CFG:
            if conv_idx in _POOL_BEFORE:
                hx = nn.max_pool(hx, (2, 2), strides=(2, 2))
                hy = nn.max_pool(hy, (2, 2), strides=(2, 2))
            conv = nn.Conv(ch, (3, 3), padding=1, param_dtype=jnp.float32,
                           dtype=self.dtype, name=f"conv_{conv_idx}")
            hx, hy = nn.relu(conv(hx)), nn.relu(conv(hy))
            relu_idx = conv_idx + 1
            if relu_idx in _TAP_AFTER:
                feats_x.append(hx.astype(jnp.float32))
                feats_y.append(hy.astype(jnp.float32))

        total = 0.0
        for i, (fx, fy) in enumerate(zip(feats_x, feats_y)):
            fx = fx / (jnp.linalg.norm(fx, axis=-1, keepdims=True) + 1e-10)
            fy = fy / (jnp.linalg.norm(fy, axis=-1, keepdims=True) + 1e-10)
            d = jnp.square(fx - fy)
            lin = nn.Conv(1, (1, 1), padding=0, use_bias=False,
                          param_dtype=jnp.float32, name=f"lin_{i}")
            total = total + jnp.mean(lin(d), axis=(1, 2), keepdims=True)
        return total  # (B, 1, 1, 1)


def convert_lpips_checkpoint(sd: Mapping) -> dict:
    """taming-format LPIPS state dict ('net.sliceK.<i>.weight', 'lin<i>.model.1.weight')
    -> flax params for LPIPS."""

    def _np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    params = {}
    for key, v in sd.items():
        if ".slice" in key and key.endswith(".weight"):
            idx = int(key.split(".")[-2])
            params.setdefault(f"conv_{idx}", {})["kernel"] = _np(v).transpose(2, 3, 1, 0)
        elif ".slice" in key and key.endswith(".bias"):
            idx = int(key.split(".")[-2])
            params.setdefault(f"conv_{idx}", {})["bias"] = _np(v)
        elif key.startswith("lin") and key.endswith("model.1.weight"):
            i = int(key[3])
            params[f"lin_{i}"] = {"kernel": _np(v).transpose(2, 3, 1, 0)}
    return params
