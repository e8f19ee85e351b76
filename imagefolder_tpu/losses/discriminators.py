"""Discriminators: DinoDisc (main), PatchGAN, StyleGAN
(reference ``discriminator_{dino,patchgan,stylegan}.py``).

TPU-first notes:
* DinoDisc's frozen DINO-S/16 backbone is a ``ViTBackbone`` (no LayerScale);
  its params live in the same tree but are frozen via optimizer labels, with
  gradients cut by ``stop_gradient`` on activations only where the reference
  freezes (heads still backprop into images through the frozen trunk).
* SpectralNorm power-iteration state is a flax ``batch_stats`` variable
  (flax.linen.SpectralNorm) — carried in the train state, not module-mutated.
* BatchNormLocal (virtual batch 8) is a pure group reshape — no cross-device
  sync needed; the reference's broken ``lbn/hbn`` local-machine SyncBN path
  (SURVEY quirk) is intentionally dropped.
* The random crop-or-resize to 224 is a traced Bernoulli + dynamic_slice.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from imagefolder_tpu.models.vit import ViTBackbone
from imagefolder_tpu.ops.resize import resize
from imagefolder_tpu.utils.torch_init import conv_kaiming_uniform

__all__ = ["DinoDisc", "PatchGANDiscriminator", "StyleGANDiscriminator"]

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


class BatchNormLocal(nn.Module):
    """Virtual-batch norm (discriminator_dino.py:127-154): stats over
    (virtual-batch-group, length) per channel. Input (B, L, C)."""

    virtual_bs: int = 8
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):  # (B, L, C)
        b, l, c = x.shape
        g = -(-b // self.virtual_bs)
        xg = x.astype(jnp.float32).reshape(g, -1, l, c)
        mean = jnp.mean(xg, axis=(1, 2), keepdims=True)
        var = jnp.var(xg, axis=(1, 2), keepdims=True)
        xg = (xg - mean) / jnp.sqrt(var + self.eps)
        w = self.param("scale", nn.initializers.ones, (c,))
        bb = self.param("bias", nn.initializers.zeros, (c,))
        return (xg * w + bb).reshape(b, l, c)


def _spectral_conv1d(features, kernel_size, name):
    """Conv over the token axis with circular padding + spectral norm
    (discriminator_dino.py:121-124, 170-171). Input (B, L, C)."""
    conv = nn.Conv(features, (kernel_size,), padding="CIRCULAR",
                   kernel_init=conv_kaiming_uniform, param_dtype=jnp.float32,
                   name=f"{name}_conv")
    return nn.SpectralNorm(conv, collection_name="spectral")


class _HeadBlock(nn.Module):
    """make_block (discriminator_dino.py:157-174): SNConv1d -> BatchNormLocal
    -> LeakyReLU(0.2)."""

    channels: int
    kernel_size: int
    name_prefix: str = "blk"

    @nn.compact
    def __call__(self, x, *, update_stats: bool):
        x = _spectral_conv1d(self.channels, self.kernel_size, self.name_prefix)(
            x, update_stats=update_stats
        )
        x = BatchNormLocal(name=f"{self.name_prefix}_bn")(x)
        return nn.leaky_relu(x, 0.2)


class _DinoHead(nn.Module):
    """One DinoDisc head (discriminator_dino.py:208-217): block(k=1) ->
    residual block(k=9) -> SNConv1d -> logits (B, L)."""

    channels: int
    ks: int = 9

    @nn.compact
    def __call__(self, x, *, update_stats: bool):
        x = _HeadBlock(self.channels, 1, name="b0", name_prefix="b0")(
            x, update_stats=update_stats
        )
        r = _HeadBlock(self.channels, self.ks, name="b1", name_prefix="b1")(
            x, update_stats=update_stats
        )
        x = (x + r) * (1.0 / math.sqrt(2.0))
        x = _spectral_conv1d(1, 1, "out")(x, update_stats=update_stats)
        return x[..., 0]  # (B, L)


class DinoDisc(nn.Module):
    """Frozen DINO-S/16 @224 emitting readout activations at depths
    {pre, 2, 5, 8, 11}, each scored by a trainable conv head
    (discriminator_dino.py:177-248). Input NHWC in [-1, 1]."""

    depth: int = 12
    key_depths: Sequence[int] = (2, 5, 8, 11)
    ks: int = 9
    norm_eps: float = 1e-6
    # trunk compute dtype; the reference's disc pass runs inside
    # autocast(bf16) by default (xqgan_train.py:419,467), so bfloat16 is the
    # parity-faithful training setting. Readout taps + heads stay fp32.
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.dino = ViTBackbone(
            img_size=224, patch_size=16, embed_dim=384, depth=self.depth,
            num_heads=6, init_values=None, dtype=self.dtype, name="dino",
        )
        kd = tuple(d for d in self.key_depths if d < self.depth)
        self.kd = kd
        self.heads = tuple(
            _DinoHead(384, self.ks, name=f"head_{i}") for i in range(len(kd) + 1)
        )

    def _preprocess(self, x, key):
        """[-1,1] -> imagenet-normalized 224x224; >224 inputs take a random
        crop half the time, else area resize (discriminator_dino.py:296-336)."""
        scale = jnp.asarray([0.5 / s for s in _IMAGENET_STD])
        shift = jnp.asarray([(0.5 - m) / s for m, s in zip(_IMAGENET_MEAN, _IMAGENET_STD)])
        x = x.astype(jnp.float32) * scale + shift
        h = x.shape[1]
        if h == 224:
            return x
        if h < 224:
            return resize(x, (224, 224), "bicubic")
        resized = resize(x, (224, 224), "area")
        if key is None:
            return resized
        kc, kh, kw = jax.random.split(key, 3)
        oh = jax.random.randint(kh, (), 0, h - 224 + 1)
        ow = jax.random.randint(kw, (), 0, x.shape[2] - 224 + 1)
        cropped = jax.lax.dynamic_slice(
            x, (0, oh, ow, 0), (x.shape[0], 224, 224, x.shape[-1])
        )
        take_crop = jax.random.uniform(kc, ()) <= 0.5
        return jnp.where(take_crop, cropped, resized)

    def __call__(self, x, *, rng=None, train: bool = False):
        x = self._preprocess(x, rng if train else None)
        m = self.dino
        tokens = m.patchify(x)
        t = m.pos_embed_tokens(tokens)  # (B, 1+L, D) fp32
        acts = [t[:, 1:] + t[:, :1]]  # readout: patches + cls
        t = t.astype(m.dtype)
        for i, blk in enumerate(m.blocks):
            t = blk(t)
            if i in self.kd:
                tf = t.astype(jnp.float32)
                acts.append(tf[:, 1:] + tf[:, :1])
        # frozen trunk: params are excluded from the disc optimizer via
        # labels; activations keep gradients w.r.t. the INPUT image (needed
        # for the generator adversarial term).
        logits = [
            head(act, update_stats=train) for head, act in zip(self.heads, acts)
        ]
        return jnp.concatenate(logits, axis=1)  # (B, 5L)


class PatchGANDiscriminator(nn.Module):
    """Pix2Pix NLayer discriminator (discriminator_patchgan.py:8-68).
    BatchNorm runs in local-stats mode inside the jitted step (train) and
    uses running stats otherwise."""

    ndf: int = 64
    n_layers: int = 3

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        init = nn.initializers.normal(0.02)
        x = nn.Conv(self.ndf, (4, 4), 2, padding=1, kernel_init=init, name="conv0")(x)
        x = nn.leaky_relu(x, 0.2)
        nf = 1
        for n in range(1, self.n_layers + 1):
            nf_prev, nf = nf, min(2 ** n, 8)
            stride = 2 if n < self.n_layers else 1
            x = nn.Conv(self.ndf * nf, (4, 4), stride, padding=1, use_bias=False,
                        kernel_init=init, name=f"conv{n}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, scale_init=nn.initializers.normal(0.02),
                             name=f"bn{n}")(x)
            x = nn.leaky_relu(x, 0.2)
        return nn.Conv(1, (4, 4), 1, padding=1, kernel_init=init, name="conv_out")(x)


class StyleGANDiscriminator(nn.Module):
    """StyleGAN2-style conv discriminator (discriminator_stylegan.py:13-54)."""

    image_size: int = 256
    channel_multiplier: int = 1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        channels = {4: 512, 8: 512, 16: 512, 32: 512,
                    64: 256 * self.channel_multiplier,
                    128: 128 * self.channel_multiplier,
                    256: 64 * self.channel_multiplier,
                    512: 32 * self.channel_multiplier,
                    1024: 16 * self.channel_multiplier}
        log_size = int(math.log2(self.image_size))
        in_ch = channels[self.image_size]
        x = nn.Conv(in_ch, (3, 3), padding=1, kernel_init=conv_kaiming_uniform,
                    name="conv_in")(x)
        x = nn.leaky_relu(x, 0.2)
        for i in range(log_size, 2, -1):
            out_ch = channels[2 ** (i - 1)]
            res = nn.Conv(out_ch, (1, 1), 2, padding=0,
                          kernel_init=conv_kaiming_uniform, name=f"res_{i}")(x)
            h = nn.Conv(out_ch, (3, 3), padding=1,
                        kernel_init=conv_kaiming_uniform, name=f"c1_{i}")(x)
            h = nn.leaky_relu(h, 0.2)
            h = nn.Conv(out_ch, (3, 3), padding=1,
                        kernel_init=conv_kaiming_uniform, name=f"c2_{i}")(h)
            h = nn.leaky_relu(h, 0.2)
            h = _blur(h)
            h = nn.Conv(out_ch, (3, 3), 2, padding=1,
                        kernel_init=conv_kaiming_uniform, name=f"down_{i}")(h)
            x = (h + res) * (1.0 / math.sqrt(2.0))
        x = nn.Conv(channels[4], (3, 3), padding=1,
                    kernel_init=conv_kaiming_uniform, name="final_conv")(x)
        x = nn.leaky_relu(x, 0.2)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(channels[4], name="fc1")(x)
        x = nn.leaky_relu(x, 0.2)
        return nn.Dense(1, name="fc2")(x)


def _blur(x):
    """Normalized [1,2,1] blur (discriminator_stylegan.py:83-91), reflect pad."""
    f = jnp.asarray([1.0, 2.0, 1.0])
    k = (f[:, None] * f[None, :]) / 16.0
    c = x.shape[-1]
    kern = jnp.tile(k[:, :, None, None], (1, 1, 1, c))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    dn = jax.lax.conv_dimension_numbers(xp.shape, kern.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(xp, kern, (1, 1), "VALID",
                                        dimension_numbers=dn, feature_group_count=c)
