"""VQGAN-style CNN encoder/decoder (reference ``xqgan_model.py:454-704``).

Taming-transformers backbone: ch=128 base, ch_mult pyramid, 2 res blocks per
level (encoder) / 3 (decoder), single-head attention at the lowest resolution,
GroupNorm(32, eps=1e-6) + swish, stride-2 conv downsample with asymmetric
(0,1) padding, nearest-2x + conv upsample.

TPU-first: NHWC layout, a ``dtype`` knob for bf16 activations (params stay
fp32), attention as one batched matmul pair (MXU), no python-side dynamic
shapes. The decoder exposes ``last_layer_param_path`` for the adaptive GAN
weight (reference ``vq_loss.py:153``).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from imagefolder_tpu.utils.torch_init import conv_kaiming_uniform

__all__ = ["Encoder", "Decoder"]


def _conv(features, kernel=3, stride=1, padding=1, name=None, dtype=None):
    k = kernel if isinstance(kernel, tuple) else (kernel, kernel)
    return nn.Conv(
        features,
        k,
        strides=stride,
        padding=padding,
        kernel_init=conv_kaiming_uniform,  # torch Conv2d default weight init
        name=name,
        dtype=dtype,
        param_dtype=jnp.float32,
    )


class _Norm(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # GroupNorm in fp32 for stability, cast back (XLA fuses the casts).
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32, name="norm")(
            x.astype(jnp.float32)
        )
        return h.astype(self.dtype)


def swish(x):
    return x * jax.nn.sigmoid(x)


class ResnetBlock(nn.Module):
    out_channels: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        in_ch = x.shape[-1]
        h = _Norm(self.dtype, name="norm1")(x)
        h = swish(h)
        h = _conv(self.out_channels, name="conv1", dtype=self.dtype)(h)
        h = _Norm(self.dtype, name="norm2")(h)
        h = swish(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = _conv(self.out_channels, name="conv2", dtype=self.dtype)(h)
        if in_ch != self.out_channels:
            x = _conv(self.out_channels, kernel=1, padding=0, name="nin_shortcut",
                      dtype=self.dtype)(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head full attention over HxW positions (xqgan_model.py:625)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hn = _Norm(self.dtype, name="norm")(x)
        q = _conv(c, kernel=1, padding=0, name="q", dtype=self.dtype)(hn)
        k = _conv(c, kernel=1, padding=0, name="k", dtype=self.dtype)(hn)
        v = _conv(c, kernel=1, padding=0, name="v", dtype=self.dtype)(hn)
        q = q.reshape(b, h * w, c)
        k = k.reshape(b, h * w, c)
        v = v.reshape(b, h * w, c)
        attn = jnp.einsum("bic,bjc->bij", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn * (c ** -0.5), axis=-1).astype(self.dtype)
        out = jnp.einsum("bij,bjc->bic", attn, v).reshape(b, h, w, c)
        out = _conv(c, kernel=1, padding=0, name="proj_out", dtype=self.dtype)(out)
        return x + out


class Downsample(nn.Module):
    """Stride-2 conv with torch's asymmetric (0,1) pad (xqgan_model.py:689)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return _conv(c, stride=2, padding=0, name="conv", dtype=self.dtype)(x)


class Upsample(nn.Module):
    """Nearest-2x then conv (xqgan_model.py:675)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return _conv(c, name="conv", dtype=self.dtype)(x)


class Encoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    z_channels: int = 256
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        num_res = len(self.ch_mult)
        h = _conv(self.ch, name="conv_in", dtype=self.dtype)(x.astype(self.dtype))
        for i_level in range(num_res):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks):
                h = ResnetBlock(block_out, self.dropout, self.dtype,
                                name=f"res_{i_level}_{i_block}")(h, train=train)
                if i_level == num_res - 1:
                    h = AttnBlock(self.dtype, name=f"attn_{i_level}_{i_block}")(h)
            if i_level != num_res - 1:
                h = Downsample(self.dtype, name=f"down_{i_level}")(h)
        h = ResnetBlock(h.shape[-1], self.dropout, self.dtype, name="mid_res_0")(h, train=train)
        h = AttnBlock(self.dtype, name="mid_attn")(h)
        h = ResnetBlock(h.shape[-1], self.dropout, self.dtype, name="mid_res_1")(h, train=train)
        h = _Norm(self.dtype, name="norm_out")(h)
        h = swish(h)
        return _conv(self.z_channels, name="conv_out", dtype=self.dtype)(h)


class Decoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    out_channels: int = 3
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    # flax param path of the output conv kernel, used for the adaptive GAN
    # weight (reference decoder.last_layer, xqgan_model.py:559-561)
    last_layer_param_path = ("conv_out", "kernel")

    @nn.compact
    def __call__(self, z, *, train: bool = False, return_prelast: bool = False):
        num_res = len(self.ch_mult)
        h = _conv(self.ch * self.ch_mult[-1], name="conv_in", dtype=self.dtype)(
            z.astype(self.dtype)
        )
        h = ResnetBlock(h.shape[-1], self.dropout, self.dtype, name="mid_res_0")(h, train=train)
        h = AttnBlock(self.dtype, name="mid_attn")(h)
        h = ResnetBlock(h.shape[-1], self.dropout, self.dtype, name="mid_res_1")(h, train=train)
        for list_idx, i_level in enumerate(reversed(range(num_res))):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = ResnetBlock(block_out, self.dropout, self.dtype,
                                name=f"res_{list_idx}_{i_block}")(h, train=train)
                if i_level == num_res - 1:
                    h = AttnBlock(self.dtype, name=f"attn_{list_idx}_{i_block}")(h)
            if list_idx != num_res - 1:
                h = Upsample(self.dtype, name=f"up_{list_idx}")(h)
        h = _Norm(self.dtype, name="norm_out")(h)
        h = swish(h)
        out = _conv(self.out_channels, name="conv_out", dtype=self.dtype)(h)
        if return_prelast:
            # pre-last activation for the adaptive-GAN-weight vjp (the
            # reference differentiates w.r.t. decoder.last_layer,
            # vq_loss.py:153); see train.tokenizer_train.apply_last_layer
            return out, h
        return out
