"""MaskGIT-style masked generator (reference ``RAR/maskgit.py`` ImageBert).

Bidirectional transformer over [cond, tokens] with a mask token; arccos
masking schedule for training (``masking_input_tokens``); iterative
confidence-based parallel decoding with constant/linear/power-cosine CFG for
sampling. Shares the RAR token-space convention.

TPU-first: the BERT trunk is a plain pre-LN ViT-style stack (the reference
wraps HF BertModel); generation's ``num_sample_steps`` loop is a static
python loop of jitted steps with fixed shapes (ids carry the mask token id).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from imagefolder_tpu.utils.torch_init import linear_kaiming_uniform, trunc_normal

__all__ = ["MaskGITConfig", "MaskGIT", "maskgit_generate", "mask_input_tokens",
           "mlm_loss"]


@dataclasses.dataclass
class MaskGITConfig:
    embed_dim: int = 768
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    image_seq_len: int = 256
    codebook_size: int = 4096
    condition_num_classes: int = 1000
    dropout: float = 0.1
    dtype_str: str = "float32"
    # "bert" = ImageBert trunk (maskgit.py:40); "uvit" = UViTBert
    # (maskgit.py:209-287): depth//2 in-blocks -> 1 mid-block -> depth//2
    # out-blocks, each out-block fusing its mirrored in-block activation
    # through a Dense on concat (U-Net skips; U-ViT, arXiv:2209.12152).
    arch: str = "bert"

    @property
    def dtype(self):
        return jnp.bfloat16 if self.dtype_str == "bfloat16" else jnp.float32

    @property
    def mask_token_id(self):
        return self.codebook_size

    @property
    def vocab(self):
        return self.codebook_size + self.condition_num_classes + 2

    @property
    def none_condition_id(self):
        return self.condition_num_classes + self.codebook_size + 1


class _Block(nn.Module):
    num_heads: int
    mlp_ratio: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="norm1")(
            x.astype(jnp.float32)).astype(self.dtype)
        qkv = nn.Dense(3 * d, kernel_init=linear_kaiming_uniform,
                       dtype=self.dtype, param_dtype=jnp.float32,
                       name="qkv")(h)
        b, n, _ = x.shape
        hd = d // self.num_heads
        qkv = qkv.reshape(b, n, 3, self.num_heads, hd)
        from imagefolder_tpu.ops.pallas.attention import dot_product_attention
        o = dot_product_attention(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2])
        o = nn.Dense(d, kernel_init=linear_kaiming_uniform, dtype=self.dtype,
                     param_dtype=jnp.float32, name="proj")(o.reshape(b, n, d))
        x = x + o
        h = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32, name="norm2")(
            x.astype(jnp.float32)).astype(self.dtype)
        h = nn.Dense(int(d * self.mlp_ratio),
                     kernel_init=linear_kaiming_uniform, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(h)
        from imagefolder_tpu.ops.activations import gelu_exact
        h = gelu_exact(h)
        h = nn.Dense(d, kernel_init=linear_kaiming_uniform, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc2")(h)
        return x + h


class _UViTBlock(nn.Module):
    """U-ViT pre-LN block (reference ``RAR/modules/blocks.py:171-198``):
    optional skip fusion ``x = Dense(concat(x, skip))`` then attn + MLP
    residuals. qkv carries no bias, LayerNorm eps is the torch default."""

    num_heads: int
    mlp_ratio: float
    dtype: jnp.dtype
    skip: bool = False

    @nn.compact
    def __call__(self, x, skip_x=None):
        d = x.shape[-1]
        if self.skip:
            x = nn.Dense(d, kernel_init=trunc_normal(0.02), dtype=self.dtype,
                         param_dtype=jnp.float32, name="skip_linear")(
                jnp.concatenate([x, skip_x], axis=-1))
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(
            x.astype(jnp.float32)).astype(self.dtype)
        qkv = nn.Dense(3 * d, use_bias=False, kernel_init=trunc_normal(0.02),
                       dtype=self.dtype, param_dtype=jnp.float32,
                       name="qkv")(h)
        b, n, _ = x.shape
        hd = d // self.num_heads
        qkv = qkv.reshape(b, n, 3, self.num_heads, hd)
        from imagefolder_tpu.ops.pallas.attention import dot_product_attention
        o = dot_product_attention(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2])
        o = nn.Dense(d, kernel_init=trunc_normal(0.02), dtype=self.dtype,
                     param_dtype=jnp.float32, name="proj")(o.reshape(b, n, d))
        x = x + o
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(
            x.astype(jnp.float32)).astype(self.dtype)
        h = nn.Dense(int(d * self.mlp_ratio), kernel_init=trunc_normal(0.02),
                     dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(h)
        from imagefolder_tpu.ops.activations import gelu_exact
        h = gelu_exact(h)
        h = nn.Dense(d, kernel_init=trunc_normal(0.02), dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc2")(h)
        return x + h


class MaskGIT(nn.Module):
    config: MaskGITConfig

    def setup(self):
        cfg = self.config
        self.embeddings = self.param("embeddings", trunc_normal(0.02),
                                     (cfg.vocab, cfg.embed_dim))
        self.pos_embed = self.param("pos_embed", trunc_normal(0.02),
                                    (1, cfg.image_seq_len + 1, cfg.embed_dim))
        if cfg.arch == "uvit":
            assert cfg.depth % 2 == 0, "uvit arch needs an even depth"
            half = cfg.depth // 2
            self.in_blocks = [
                _UViTBlock(cfg.num_heads, cfg.mlp_ratio, cfg.dtype,
                           name=f"in_block_{i}") for i in range(half)]
            self.mid_block = _UViTBlock(cfg.num_heads, cfg.mlp_ratio,
                                        cfg.dtype, name="mid_block")
            self.out_blocks = [
                _UViTBlock(cfg.num_heads, cfg.mlp_ratio, cfg.dtype, skip=True,
                           name=f"out_block_{i}") for i in range(half)]
            self.final_norm = nn.LayerNorm(epsilon=1e-5, name="final_norm")
        elif cfg.arch == "bert":
            self.blocks = [_Block(cfg.num_heads, cfg.mlp_ratio, cfg.dtype,
                                  name=f"block_{i}") for i in range(cfg.depth)]
            self.final_norm = nn.LayerNorm(epsilon=1e-12, name="final_norm")
        else:
            raise ValueError(f"unknown maskgit arch {cfg.arch!r}")
        self.lm_head = nn.Dense(cfg.codebook_size,
                                kernel_init=linear_kaiming_uniform,
                                param_dtype=jnp.float32, name="lm_head")

    def __call__(self, input_ids, condition, *, cond_drop_prob: float = 0.1,
                 rng: Optional[jax.Array] = None):
        """(maskgit.py:88-110): prepend shifted condition token, BERT trunk,
        logits for image positions."""
        cfg = self.config
        b = input_ids.shape[0]
        cond = condition + cfg.codebook_size + 1
        if cond_drop_prob >= 1.0:
            cond = jnp.full_like(cond, cfg.none_condition_id)
        elif cond_drop_prob > 0 and rng is not None:
            drop = jax.random.uniform(rng, cond.shape) < cond_drop_prob
            cond = jnp.where(drop, cfg.none_condition_id, cond)
        ids = jnp.concatenate([cond.reshape(b, 1), input_ids], axis=1)
        x = jnp.take(self.embeddings, ids, axis=0) + self.pos_embed
        x = x.astype(cfg.dtype)
        if cfg.arch == "uvit":
            skips = []
            for blk in self.in_blocks:
                x = blk(x)
                skips.append(x)
            x = self.mid_block(x)
            for blk in self.out_blocks:
                x = blk(x, skips.pop())
        else:
            for blk in self.blocks:
                x = blk(x)
        x = self.final_norm(x.astype(jnp.float32))
        return self.lm_head(x[:, 1:])


def mask_input_tokens(tokens, key, mask_token_id: int):
    """arccos masking schedule (maskgit.py:195-207)."""
    b, l = tokens.shape
    k1, k2 = jax.random.split(key)
    t = jax.random.uniform(k1, (b,))
    ratio = jnp.clip(jnp.arccos(t) / (math.pi * 0.5), 1e-6, 1.0)
    num_masked = jnp.clip(jnp.round(l * ratio), 1, l)
    scores = jax.random.uniform(k2, (b, l))
    ranks = jnp.argsort(jnp.argsort(scores, axis=-1), axis=-1)
    masks = ranks < num_masked[:, None]
    return jnp.where(masks, mask_token_id, tokens), masks


def mlm_loss(logits, targets, masks, loss_weight_unmasked: float = 0.1):
    """Reference MLMLoss (RAR/modules/losses.py:355-373)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    w = masks.astype(jnp.float32)
    lw = (1.0 - w) * loss_weight_unmasked + w
    loss = jnp.sum(nll * lw) / (jnp.sum(lw) + 1e-8)
    correct = jnp.sum((jnp.argmax(logits, -1) == targets) * w, axis=1) / (
        jnp.sum(w, axis=1) + 1e-8)
    return loss, jnp.mean(correct)


def _gumbel(key, shape):
    u = jax.random.uniform(key, shape, minval=1e-20, maxval=1.0)
    return -jnp.log(-jnp.log(u))


def maskgit_generate(model: MaskGIT, params, condition, key, *,
                     guidance_scale: float = 3.0,
                     guidance_decay: str = "constant",
                     guidance_scale_pow: float = 3.0,
                     randomize_temperature: float = 4.5,
                     softmax_temperature_annealing: bool = False,
                     num_sample_steps: int = 8):
    """Iterative parallel decoding (maskgit.py:111-193)."""
    assert guidance_decay in ("constant", "linear", "power-cosine")
    cfg = model.config
    b = condition.shape[0]
    l = cfg.image_seq_len
    ids = jnp.full((b, l), cfg.mask_token_id, jnp.int32)
    cfg_scale = guidance_scale if guidance_decay == "constant" else 0.0

    fwd = jax.jit(lambda p, i, c, d: model.apply(
        {"params": p}, i, c, cond_drop_prob=d), static_argnums=(3,))

    for step in range(num_sample_steps):
        ratio = (step + 1) / num_sample_steps
        temp = randomize_temperature * (1.0 - ratio)
        is_mask = ids == cfg.mask_token_id
        if guidance_decay == "power-cosine":
            s = (1 - math.cos(((step / num_sample_steps) ** guidance_scale_pow)
                              * math.pi)) * 0.5
            cfg_scale = (guidance_scale - 1) * s + 1
        if cfg_scale != 0:
            cond_logits = fwd(params, ids, condition, 0.0)
            uncond_logits = fwd(params, ids, condition, 1.0)
            if guidance_decay == "power-cosine":
                logits = uncond_logits + (cond_logits - uncond_logits) * cfg_scale
            else:
                logits = cond_logits + (cond_logits - uncond_logits) * cfg_scale
        else:
            logits = fwd(params, ids, condition, 0.0)
        if softmax_temperature_annealing:
            logits = logits / (0.5 + 0.8 * (1 - ratio))

        key, k1, k2 = jax.random.split(key, 3)
        noisy = logits + temp * _gumbel(k1, logits.shape)
        sampled = jnp.argmax(noisy, axis=-1)
        sampled_logits = jnp.take_along_axis(logits, sampled[..., None],
                                             axis=-1)[..., 0]
        sampled = jnp.where(is_mask, sampled, ids)
        sampled_logits = jnp.where(is_mask, sampled_logits, jnp.inf)

        mask_ratio = math.acos(ratio) / (math.pi * 0.5)
        mask_len = int(max(1, min(l - 1, math.floor(l * mask_ratio))))
        confidence = sampled_logits + temp * _gumbel(k2, sampled_logits.shape)
        cut = jnp.sort(confidence, axis=-1)[:, mask_len - 1:mask_len]
        masking = confidence <= cut
        if step == num_sample_steps - 1:
            ids = sampled
        else:
            ids = jnp.where(masking, cfg.mask_token_id, sampled)
        if guidance_decay == "linear":
            cfg_scale = ratio * guidance_scale
    return ids
