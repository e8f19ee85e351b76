"""VAR: next-scale-prediction transformer (reference ``models/var.py`` +
``models/basic_var.py``).

GPT-2-style decoder over the multi-scale token pyramid (L = sum pn^2):
class-embedding SOS + per-scale level embedding + absolute positions, AdaLN
conditioning (shared or per-block), block-causal attention (scale i attends
to scales <= i), head predicting ``codebook_size * product_quant`` logits
("folded" PQ branches decoded in parallel, reference xqgan_model.py:123).

TPU-first:
* training forward is one fused graph: fused-qkv attention via
  ``jax.nn.dot_product_attention`` with the static block-causal bias.
* CFG decoding unrolls the (static) 10-stage loop with a preallocated KV
  cache per block — every stage has static shapes, the whole sampler jits
  into a single executable (the reference re-dispatches python per stage).
* MLM-style token dropout and class-cond dropout use explicit rng streams.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from imagefolder_tpu.utils.torch_init import linear_kaiming_uniform, trunc_normal

__all__ = ["VARConfig", "VAR", "build_attn_bias"]


@dataclasses.dataclass
class VARConfig:
    vocab_size: int          # total head logits = codebook_size * product_quant
    Cvae: int                # total latent channels = codebook_embed_dim * P
    product_quant: int = 1
    num_classes: int = 1000
    depth: int = 16
    embed_dim: int = 1024    # reference: 64 * depth
    num_heads: int = 16      # reference: depth
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    norm_eps: float = 1e-6
    shared_aln: bool = False
    cond_drop_rate: float = 0.1
    attn_l2_norm: bool = False
    patch_nums: Sequence[int] = (1, 2, 3, 4, 5, 6, 8, 10, 13, 16)
    p_drop: float = 0.15     # MLM-style token dropout budget (var.py:130)
    remat: bool = False      # activation checkpointing per block
    dtype_str: str = "float32"

    @property
    def dtype(self):
        return jnp.bfloat16 if self.dtype_str == "bfloat16" else jnp.float32

    @property
    def L(self):
        return sum(p * p for p in self.patch_nums)

    @property
    def first_l(self):
        return self.patch_nums[0] ** 2

    @property
    def begin_ends(self):
        out, cur = [], 0
        for p in self.patch_nums:
            out.append((cur, cur + p * p))
            cur += p * p
        return out


def build_attn_bias(patch_nums) -> np.ndarray:
    """Block-causal bias (var.py:110-116): token in scale i attends to scales
    <= i. Returns (1, 1, L, L) float32 with 0 / -inf."""
    d = np.concatenate([np.full((p * p,), i) for i, p in enumerate(patch_nums)])
    mask = d[:, None] >= d[None, :]
    return np.where(mask, 0.0, -np.inf).astype(np.float32)[None, None]


class VARSelfAttention(nn.Module):
    """basic_var.py:58-134: fused qkv with zero-k-bias, optional L2-normed QK
    with learned temperature, KV cache for decode."""

    embed_dim: int
    num_heads: int
    attn_l2_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.embed_dim
        self.mat_qkv = nn.Dense(3 * c, use_bias=False,
                                kernel_init=linear_kaiming_uniform,
                                dtype=self.dtype, param_dtype=jnp.float32,
                                name="mat_qkv")
        self.q_bias = self.param("q_bias", nn.initializers.zeros, (c,))
        self.v_bias = self.param("v_bias", nn.initializers.zeros, (c,))
        self.proj = nn.Dense(c, kernel_init=linear_kaiming_uniform,
                             dtype=self.dtype, param_dtype=jnp.float32,
                             name="proj")
        if self.attn_l2_norm:
            self.scale_mul = self.param(
                "scale_mul", nn.initializers.constant(math.log(4.0)),
                (1, self.num_heads, 1, 1))

    def __call__(self, x, attn_bias=None, cache: Optional[Tuple] = None):
        b, l, c = x.shape
        hd = c // self.num_heads
        bias_full = jnp.concatenate(
            [self.q_bias, jnp.zeros_like(self.q_bias), self.v_bias])
        qkv = (self.mat_qkv(x) + bias_full.astype(x.dtype)).reshape(
            b, l, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, L, H, hd)
        if self.attn_l2_norm:
            scale = 1.0
            mul = jnp.exp(jnp.minimum(self.scale_mul, math.log(100.0)))
            mul = jnp.transpose(mul, (0, 2, 1, 3))  # (1,1,H,1) for BLHc
            q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12) * mul
            k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-12)
        else:
            scale = 0.25 / math.sqrt(hd)
        new_cache = None
        if cache is not None:
            ck, cv = cache
            if ck is not None:
                k = jnp.concatenate([ck, k], axis=1)
                v = jnp.concatenate([cv, v], axis=1)
            new_cache = (k, v)
        from imagefolder_tpu.ops.pallas.attention import dot_product_attention

        out = dot_product_attention(
            q.astype(self.dtype), k.astype(self.dtype), v.astype(self.dtype),
            bias=None if attn_bias is None else attn_bias.astype(jnp.float32),
            scale=scale)
        out = out.reshape(b, l, c)
        return self.proj(out), new_cache


class FFN(nn.Module):
    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, kernel_init=linear_kaiming_uniform,
                     dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(x)
        x = nn.gelu(x, approximate=True)  # reference GELU(approximate='tanh')
        return nn.Dense(self.out, kernel_init=linear_kaiming_uniform,
                        dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(x)


class AdaLNSelfAttn(nn.Module):
    """basic_var.py:140-171."""

    embed_dim: int
    cond_dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    shared_aln: bool = False
    attn_l2_norm: bool = False
    drop_path: float = 0.0
    norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.embed_dim
        self.attn = VARSelfAttention(c, self.num_heads, self.attn_l2_norm,
                                     self.dtype, name="attn")
        self.ffn = FFN(round(c * self.mlp_ratio), c, self.dtype, name="ffn")
        self.ln_wo_grad = nn.LayerNorm(epsilon=self.norm_eps, use_bias=False,
                                       use_scale=False, name="ln")
        if self.shared_aln:
            self.ada_gss = self.param(
                "ada_gss", nn.initializers.normal(1.0 / math.sqrt(c)),
                (1, 1, 6, c))
        else:
            self.ada_lin = nn.Dense(6 * c, kernel_init=linear_kaiming_uniform,
                                    param_dtype=jnp.float32, name="ada_lin")

    def _drop_path(self, x, train):
        if self.drop_path <= 0 or not train:
            return x
        keep = 1.0 - self.drop_path
        mask = jax.random.bernoulli(
            self.make_rng("droppath"), keep,
            (x.shape[0],) + (1,) * (x.ndim - 1)).astype(x.dtype)
        return x * mask / keep

    def __call__(self, x, cond_BD, attn_bias=None, cache=None, train=False):
        if self.shared_aln:
            # cond_BD here is shared_ada_lin(cond): (B, 1, 6, C)
            gss = (self.ada_gss + cond_BD).astype(jnp.float32)
            g1, g2, s1, s2, sh1, sh2 = [gss[:, :, i] for i in range(6)]
        else:
            a = self.ada_lin(nn.silu(cond_BD.astype(jnp.float32)))
            a = a.reshape(-1, 1, 6, self.embed_dim)
            g1, g2, s1, s2, sh1, sh2 = [a[:, :, i] for i in range(6)]
        xf = x.astype(jnp.float32)
        h = self.ln_wo_grad(xf) * (s1 + 1.0) + sh1
        attn_out, new_cache = self.attn(h.astype(self.dtype), attn_bias, cache)
        x = xf + self._drop_path(attn_out.astype(jnp.float32) * g1, train)
        h = self.ln_wo_grad(x) * (s2 + 1.0) + sh2
        x = x + self._drop_path(
            self.ffn(h.astype(self.dtype)).astype(jnp.float32) * g2, train)
        return x.astype(self.dtype), new_cache


class AdaLNBeforeHead(nn.Module):
    """basic_var.py:177-186."""

    embed_dim: int
    norm_eps: float = 1e-6

    @nn.compact
    def __call__(self, x, cond_BD):
        c = self.embed_dim
        a = nn.Dense(2 * c, kernel_init=linear_kaiming_uniform,
                     param_dtype=jnp.float32, name="ada_lin")(
            nn.silu(cond_BD.astype(jnp.float32)))
        a = a.reshape(-1, 1, 2, c)
        scale, shift = a[:, :, 0], a[:, :, 1]
        ln = nn.LayerNorm(epsilon=self.norm_eps, use_bias=False,
                          use_scale=False, name="ln")
        return ln(x.astype(jnp.float32)) * (scale + 1.0) + shift


class VAR(nn.Module):
    config: VARConfig

    def setup(self):
        cfg = self.config
        c = cfg.embed_dim
        init_std = math.sqrt(1 / c / 3)
        self.word_embed = nn.Dense(c, kernel_init=linear_kaiming_uniform,
                                   param_dtype=jnp.float32, name="word_embed")
        self.class_emb = self.param("class_emb", trunc_normal(init_std),
                                    (cfg.num_classes + 1, c))
        self.pos_start = self.param("pos_start", trunc_normal(init_std),
                                    (1, cfg.first_l, c))
        self.pos_1LC = self.param("pos_1LC", trunc_normal(init_std),
                                  (1, cfg.L, c))
        self.lvl_embed = self.param("lvl_embed", trunc_normal(init_std),
                                    (len(cfg.patch_nums), c))
        if cfg.shared_aln:
            self.shared_ada_lin = nn.Dense(
                6 * c, kernel_init=linear_kaiming_uniform,
                param_dtype=jnp.float32, name="shared_ada_lin")
        dpr = np.linspace(0, cfg.drop_path_rate, cfg.depth)
        self.blocks = [
            AdaLNSelfAttn(c, c, cfg.num_heads, cfg.mlp_ratio, cfg.shared_aln,
                          cfg.attn_l2_norm, float(dpr[i]), cfg.norm_eps,
                          cfg.dtype, name=f"block_{i}")
            for i in range(cfg.depth)
        ]
        self.head_nm = AdaLNBeforeHead(c, cfg.norm_eps, name="head_nm")
        self.head = nn.Dense(cfg.vocab_size, kernel_init=linear_kaiming_uniform,
                             param_dtype=jnp.float32, name="head")
        if cfg.p_drop > 0:
            self.empty_emb = self.param("empty_emb", trunc_normal(init_std), (1, c))
        # static level ids per position
        self.lvl_1L = jnp.asarray(np.concatenate(
            [np.full((p * p,), i, np.int32) for i, p in enumerate(cfg.patch_nums)]))
        self.attn_bias = jnp.asarray(build_attn_bias(cfg.patch_nums))

    def _cond(self, cond_BD):
        if self.config.shared_aln:
            return self.shared_ada_lin(nn.silu(cond_BD)).reshape(
                cond_BD.shape[0], 1, 6, self.config.embed_dim)
        return cond_BD

    # ------------------------------ training ------------------------------ #
    def __call__(self, label_B, x_BLCv_wo_first_l, p_drop_factor: float = 0.0,
                 train: bool = False, prog_si: int = -1):
        """Teacher-forcing forward (var.py:235-292) -> logits (B, L, vocab).

        prog_si >= 0: progressive training (var.py:241-248) — the sequence is
        truncated to ed = begin_ends[prog_si][1] positions (the caller feeds a
        correspondingly truncated teacher-forcing input; sos-only at stage 0).
        """
        cfg = self.config
        ed = cfg.begin_ends[prog_si][1] if prog_si >= 0 else cfg.L
        b = label_B.shape[0]
        if train and cfg.cond_drop_rate > 0:
            drop = jax.random.uniform(self.make_rng("sample"), (b,)) < cfg.cond_drop_rate
            label_B = jnp.where(drop, cfg.num_classes, label_B)
        cond_BD = jnp.take(self.class_emb, label_B, axis=0)  # (B, C)
        sos = jnp.broadcast_to(cond_BD[:, None], (b, cfg.first_l, cfg.embed_dim))
        sos = sos + self.pos_start

        if prog_si == 0:
            x = sos
        else:
            x = jnp.concatenate(
                [sos, self.word_embed(x_BLCv_wo_first_l.astype(jnp.float32))],
                axis=1)
        if x.shape[1] != ed:
            raise ValueError(
                f"teacher-forcing input covers {x.shape[1]} positions but "
                f"prog stage {prog_si} expects {ed} — truncate the input with "
                "idxBl_to_var_input(..., prog_si)")

        if cfg.p_drop > 0 and train:
            # MLM-style token dropout with learned empty embedding
            # (var.py:251-261): threshold p ~ U(0, p_drop * factor) per batch.
            k1, k2 = jax.random.split(self.make_rng("sample"))
            p = jax.random.uniform(k1, ()) * (cfg.p_drop * p_drop_factor)
            u = jax.random.uniform(k2, (b, x.shape[1] - cfg.first_l))
            keep = jnp.concatenate(
                [jnp.ones((b, cfg.first_l), bool), u >= p], axis=1)
            x = jnp.where(keep[..., None], x, self.empty_emb[None])

        x = (x + jnp.take(self.lvl_embed, self.lvl_1L[:ed], axis=0)[None]
             + self.pos_1LC[:, :ed])
        cond_or_gss = self._cond(cond_BD)
        x = x.astype(cfg.dtype)
        attn_bias = self.attn_bias[:, :, :ed, :ed]
        for blk in self.blocks:
            if cfg.remat:
                x, _ = nn.remat(type(blk).__call__, static_argnums=(5,))(
                    blk, x, cond_or_gss, attn_bias, None, train)
            else:
                x, _ = blk(x, cond_or_gss, attn_bias=attn_bias, train=train)
        return self.head(self.head_nm(x, cond_BD)).astype(jnp.float32)

    # ------------------------------ decoding ------------------------------ #
    def begin_tokens(self, label_B):
        """CFG start: (2B, first_l, C) token map + (2B, C) condition
        (var.py:170-173)."""
        cfg = self.config
        b = label_B.shape[0]
        lbl = jnp.concatenate(
            [label_B, jnp.full_like(label_B, cfg.num_classes)])
        cond_BD = jnp.take(self.class_emb, lbl, axis=0)
        lvl_pos = jnp.take(self.lvl_embed, self.lvl_1L, axis=0)[None] + self.pos_1LC
        ntm = cond_BD[:, None] + self.pos_start + lvl_pos[:, :cfg.first_l]
        return jnp.broadcast_to(ntm, (2 * b, cfg.first_l, cfg.embed_dim)), cond_BD

    def decode_stage(self, x, cond_BD, caches):
        """Run all blocks with KV caching on this stage's tokens; returns
        (logits, new_caches). No attn bias (full prefix attention)."""
        cond_or_gss = self._cond(cond_BD)
        x = x.astype(self.config.dtype)
        new_caches = []
        for blk, cache in zip(self.blocks, caches):
            x, nc = blk(x, cond_or_gss, attn_bias=None, cache=cache)
            new_caches.append(nc)
        logits = self.head(self.head_nm(x, cond_BD)).astype(jnp.float32)
        return logits, new_caches

    def next_stage_input(self, next_token_map_BHWC, cur_L: int, pn_next: int):
        """word-embed the next scale's token map + positions (var.py:228-230)."""
        cfg = self.config
        b = next_token_map_BHWC.shape[0]
        tokens = next_token_map_BHWC.reshape(b, pn_next * pn_next, cfg.Cvae)
        lvl_pos = jnp.take(self.lvl_embed, self.lvl_1L, axis=0)[None] + self.pos_1LC
        x = self.word_embed(tokens.astype(jnp.float32)) + \
            lvl_pos[:, cur_L:cur_L + pn_next * pn_next]
        return jnp.concatenate([x, x], axis=0)  # CFG double batch
