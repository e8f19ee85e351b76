"""DINOv2-style ViT encoder/decoder with learned latent tokens.

Rebuild of the reference's vendored timm ViT + latent-token wrappers
(``tokenizer/tokenizer_image/dino_enc/vision_transformer.py`` and
``dino_enc/dinov2.py``): the encoder appends ``num_latent_tokens`` learned
tokens to the patch tokens and returns only those after the backbone; the
decoder feeds mask tokens + quantized latents and unpatchifies the patch-token
outputs via a linear ``ToPixel`` head.

TPU-first: single fused qkv matmul per block, bf16-able activations with fp32
LayerNorm, static pos-embed resampling (timm's ``resample_abs_pos_embed`` =
antialiased-bicubic, precomputed as a matrix by ``ops/resize.py``), optional
LoRA adapters on MLP layers (reference peft lora, ``dinov2.py:54-61``).

Pretrained DINOv2/CLIP teacher weights can be imported from torch checkpoints
via ``utils/convert_torch.py`` helpers (no network access is assumed).

Reference quirks preserved (checkpoint behavior): the decoder's latent stream
gets an extra cls token from ``_pos_embed`` (``dinov2.py:330``), so its block
input length is ``num_img+1 + num_latent+1``.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from imagefolder_tpu.ops.activations import gelu_exact
from imagefolder_tpu.ops.resize import resize
from imagefolder_tpu.utils.torch_init import (
    linear_kaiming_uniform,
    trunc_normal,
)

__all__ = ["ViTBackbone", "LatentEncoder", "LatentDecoder", "ToPixel", "VIT_PRESETS"]

# timm dinov2 model presets (vision_transformer.py:2895-2925)
VIT_PRESETS = {
    "vit_small_patch14_dinov2.lvd142m": dict(embed_dim=384, depth=12, num_heads=6),
    "vit_base_patch14_dinov2.lvd142m": dict(embed_dim=768, depth=12, num_heads=12),
    "vit_large_patch14_dinov2.lvd142m": dict(embed_dim=1024, depth=24, num_heads=16),
    "vit_giant_patch14_dinov2.lvd142m": dict(embed_dim=1536, depth=40, num_heads=24),
    "vit_base_patch16_clip_224.openai": dict(
        embed_dim=768, depth=12, num_heads=12, init_values=None, pre_norm=True
    ),
}


class LoRADense(nn.Module):
    """Dense with optional LoRA adapter (base kernel frozen via optimizer
    labels, see train/optim.py). y = x W + b + (x A) B * (alpha/r).

    ``latent_tokens > 0`` restricts the LoRA delta to the trailing
    ``latent_tokens`` sequence positions — the LatentLoRALinear semantics of
    the reference's ``lat_lora`` tuning (dinov2.py:68-75; the module itself,
    ``models/peft_models/lora.py``, is MISSING upstream — the import crashes
    — so this is the documented best-effort reconstruction: adapt the latent
    stream only, leave image-token computation to the frozen trunk)."""

    features: int
    lora_rank: int = 0
    lora_alpha: float = 8.0
    latent_tokens: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.features, kernel_init=linear_kaiming_uniform,
                     dtype=self.dtype, param_dtype=jnp.float32, name="base")(x)
        if self.lora_rank > 0:
            a = nn.Dense(self.lora_rank, use_bias=False,
                         kernel_init=nn.initializers.normal(0.02),
                         dtype=self.dtype, param_dtype=jnp.float32, name="lora_a")(x)
            b = nn.Dense(self.features, use_bias=False,
                         kernel_init=nn.initializers.zeros,
                         dtype=self.dtype, param_dtype=jnp.float32, name="lora_b")(a)
            delta = b * (self.lora_alpha / self.lora_rank)
            if self.latent_tokens > 0:
                n = x.shape[-2]
                pos = jnp.arange(n)[:, None]
                delta = jnp.where(pos >= n - self.latent_tokens, delta, 0)
            y = y + delta
        return y


class Mlp(nn.Module):
    hidden: int
    out: int
    lora_rank: int = 0
    lora_latent_tokens: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = LoRADense(self.hidden, self.lora_rank,
                      latent_tokens=self.lora_latent_tokens,
                      dtype=self.dtype, name="fc1")(x)
        x = gelu_exact(x)
        x = LoRADense(self.out, self.lora_rank,
                      latent_tokens=self.lora_latent_tokens,
                      dtype=self.dtype, name="fc2")(x)
        return x


def _ln(name, dtype=jnp.float32):
    # timm uses LayerNorm eps=1e-6; keep the norm math fp32
    return nn.LayerNorm(epsilon=1e-6, dtype=dtype, param_dtype=jnp.float32, name=name)


class Attention(nn.Module):
    """Standard MHA (vendored vision_transformer.py:145). Fused qkv; optional
    additive mask. ``lora_rank > 0`` adds (latent-only when
    ``lora_latent_tokens > 0``) LoRA adapters on qkv and proj — the lat_lora
    target set (dinov2.py:70: ``.*\\.qkv|.*\\.proj``)."""

    num_heads: int
    qkv_bias: bool = True
    lora_rank: int = 0
    lora_latent_tokens: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        b, n, c = x.shape
        if self.lora_rank > 0:
            qkv = LoRADense(3 * c, self.lora_rank,
                            latent_tokens=self.lora_latent_tokens,
                            dtype=self.dtype, name="qkv")(x)
        else:
            qkv = nn.Dense(3 * c, use_bias=self.qkv_bias,
                           kernel_init=linear_kaiming_uniform,
                           dtype=self.dtype, param_dtype=jnp.float32,
                           name="qkv")(x)
        # packed kernel: consumes the Dense output layout directly (no HBM
        # transposes); falls back to XLA off-TPU or for per-head masks
        from imagefolder_tpu.ops.pallas.attention import attention_qkv

        out = attention_qkv(qkv, self.num_heads, bias=mask)
        if self.lora_rank > 0:
            return LoRADense(c, self.lora_rank,
                             latent_tokens=self.lora_latent_tokens,
                             dtype=self.dtype, name="proj")(out)
        return nn.Dense(c, kernel_init=linear_kaiming_uniform,
                        dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)


class RoPEAttention(nn.Module):
    """MHA with rotary embeddings (vendored vision_transformer.py:200-278):
    learnable mixed-2D rope on image tokens, learnable 1D rope on latent
    tokens, prefix (cls) unrotated."""

    num_heads: int
    num_prefix_tokens: int = 1
    num_latent_tokens: int = 32
    num_image_tokens: int = 256
    rope_theta: float = 10.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        from imagefolder_tpu.ops import rope as R

        b, n, c = x.shape
        hd = c // self.num_heads
        qkv = nn.Dense(3 * c, kernel_init=linear_kaiming_uniform,
                       dtype=self.dtype, param_dtype=jnp.float32, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        freqs = self.param(
            "freqs",
            lambda key, shape: R.init_2d_freqs_jax(
                key, hd, self.num_heads, self.rope_theta),
            (2, self.num_heads, hd // 2))
        freqs_1d = self.param(
            "freqs_1d",
            lambda key, shape: jnp.asarray(R.init_1d_freqs(hd, self.num_latent_tokens)),
            (self.num_latent_tokens, hd // 2, 2))

        g = int(math.sqrt(self.num_image_tokens))
        t_x, t_y = R.init_t_xy(g, g)
        cis2d = R.compute_mixed_cis(freqs, jnp.asarray(t_x), jnp.asarray(t_y))

        p, nl = self.num_prefix_tokens, self.num_latent_tokens

        def rot(t):
            img = R.apply_rotary(t[:, p:n - nl], cis2d)
            lat = R.apply_rotary(t[:, n - nl:], freqs_1d)
            return jnp.concatenate([t[:, :p], img, lat], axis=1)

        q, k = rot(q), rot(k)
        from imagefolder_tpu.ops.pallas.attention import dot_product_attention

        out = dot_product_attention(q, k, v, bias=mask)
        out = out.reshape(b, n, c)
        return nn.Dense(c, kernel_init=linear_kaiming_uniform,
                        dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)


class _DensePair(nn.Module):
    """Declares nn.Dense-identical params (same path/init) without computing,
    so fused Pallas sublayers can consume them directly."""

    din: int
    dout: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", linear_kaiming_uniform, (self.din, self.dout))
        b = self.param("bias", nn.initializers.zeros, (self.dout,))
        return k, b


class _AttnParams(nn.Module):
    c: int

    @nn.compact
    def __call__(self):
        wq, bq = _DensePair(self.c, 3 * self.c, name="qkv")()
        wp, bp = _DensePair(self.c, self.c, name="proj")()
        return wq, bq, wp, bp


class _LoraBase(nn.Module):
    din: int
    dout: int

    @nn.compact
    def __call__(self):
        return _DensePair(self.din, self.dout, name="base")()


class _MlpParams(nn.Module):
    c: int
    hidden: int

    @nn.compact
    def __call__(self):
        w1, b1 = _LoraBase(self.c, self.hidden, name="fc1")()
        w2, b2 = _LoraBase(self.hidden, self.c, name="fc2")()
        return w1, b1, w2, b2


class Block(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    init_values: Optional[float] = 1e-5  # LayerScale (dinov2)
    lora_rank: int = 0
    # lat_lora (dinov2.py:68-75): adapters also on qkv/proj, deltas applied
    # only to the trailing lora_latent_tokens positions
    lat_lora: bool = False
    lora_latent_tokens: int = 0
    dtype: jnp.dtype = jnp.float32
    use_rope: bool = False
    num_latent_tokens: int = 0
    num_image_tokens: int = 256

    @nn.compact
    def __call__(self, x, mask=None):
        c = x.shape[-1]
        if (not self.use_rope) and self.lora_rank == 0 and (
                self.init_values is not None):
            # fused sublayer path: whole residual sublayers run as single
            # Pallas kernels on TPU (XLA mirror elsewhere — numerically
            # identical to the composed module path). Params are declared
            # with the exact same tree as the composed path.
            from imagefolder_tpu.ops.pallas.block import (
                attn_sublayer,
                mlp_sublayer,
            )

            act = self.dtype
            xn = _ln("norm1", self.dtype)(x)
            wq, bq, wp, bp = _AttnParams(c, name="attn")()
            ls1 = self.param("ls1", nn.initializers.constant(self.init_values), (c,))
            x = attn_sublayer(xn.astype(act), x, wq.astype(act), bq,
                              wp.astype(act), bp, ls1, self.num_heads,
                              mask=mask)
            xn = _ln("norm2", self.dtype)(x)
            w1, b1, w2, b2 = _MlpParams(c, int(c * self.mlp_ratio), name="mlp")()
            ls2 = self.param("ls2", nn.initializers.constant(self.init_values), (c,))
            return mlp_sublayer(xn.astype(act), x, w1.astype(act), b1,
                                w2.astype(act), b2, ls2)

        lat_toks = self.lora_latent_tokens if self.lat_lora else 0
        if self.use_rope:
            attn = RoPEAttention(
                self.num_heads, num_latent_tokens=self.num_latent_tokens,
                num_image_tokens=self.num_image_tokens, dtype=self.dtype,
                name="attn")
        else:
            attn = Attention(
                self.num_heads,
                lora_rank=self.lora_rank if self.lat_lora else 0,
                lora_latent_tokens=lat_toks, dtype=self.dtype, name="attn")
        h = attn(_ln("norm1", self.dtype)(x), mask)
        if self.init_values is not None:
            h = h * self.param("ls1", nn.initializers.constant(self.init_values), (c,))
        x = x + h
        h = Mlp(int(c * self.mlp_ratio), c, self.lora_rank,
                lora_latent_tokens=lat_toks, dtype=self.dtype, name="mlp")(
            _ln("norm2", self.dtype)(x)
        )
        if self.init_values is not None:
            h = h * self.param("ls2", nn.initializers.constant(self.init_values), (c,))
        return x + h


def _convtranspose_kaiming(cout: int, p: int):
    """torch nn.ConvTranspose2d default init on weight (Cin, Cout, p, p):
    kaiming_uniform(a=sqrt(5)) with fan_in = Cout * p * p."""
    bound = 1.0 / math.sqrt(cout * p * p)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _uniform(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class ToPixel(nn.Module):
    """Patch->pixel head (dino_enc/to_pixel.py:36-94). NHWC output.

    Modes: ``linear`` (Dense + unpatchify), ``conv`` (non-overlapping
    ConvTranspose2d, kernel stored in the torch (Cin, Cout, p, p) layout),
    ``siren`` (two SineLayers, omega=30, with the reference's raw
    ``view(B, C, S, S)`` reshape — NOT patchwise), ``identity`` (tokens
    returned unchanged)."""

    img_size: int = 256
    patch_size: int = 16
    channels: int = 3
    mode: str = "linear"

    @property
    def last_layer_param_path(self):
        # adaptive disc weight anchor (reference to_pixel.get_last_layer)
        return {
            "linear": ("proj", "kernel"),
            "conv": ("deconv", "kernel"),
            "siren": ("sine2", "kernel"),
            "identity": None,
        }[self.mode]

    @nn.compact
    def __call__(self, x):  # (B, L, D)
        p = self.patch_size
        hw = self.img_size // p
        b, l, d = x.shape
        if self.mode == "linear":
            x = nn.Dense(self.channels * p * p, kernel_init=linear_kaiming_uniform,
                         param_dtype=jnp.float32, name="proj")(x)
            x = x.reshape(b, hw, hw, p, p, self.channels)
            x = x.transpose(0, 1, 3, 2, 4, 5)  # b, h, p, w, q, c
            return x.reshape(b, hw * p, hw * p, self.channels)
        if self.mode == "conv":
            # ConvTranspose2d(D, C, p, stride=p): with stride == kernel the
            # output is a per-patch projection — expressed directly as an
            # einsum on the (Cin, Cout, p, p) torch-layout kernel
            w, bias = _DeconvParams(d, self.channels, p, name="deconv")()
            y = jnp.einsum("bhwd,dcij->bhiwjc",
                           x.reshape(b, hw, hw, d).astype(jnp.float32),
                           w.astype(jnp.float32))
            y = y.reshape(b, hw * p, hw * p, self.channels) + bias
            return y
        if self.mode == "siren":
            # SineLayer(D, 2D, is_first) -> SineLayer(2D, (img//p)*p*C)
            f2 = (self.img_size // p) * p * self.channels
            h = nn.Dense(2 * d, kernel_init=_uniform(1.0 / d),
                         bias_init=_uniform(1.0 / math.sqrt(d)),
                         param_dtype=jnp.float32, name="sine1")(x)
            h = jnp.sin(30.0 * h)
            y = nn.Dense(f2, kernel_init=_uniform(math.sqrt(6.0 / (2 * d)) / 30.0),
                         bias_init=_uniform(1.0 / math.sqrt(2 * d)),
                         param_dtype=jnp.float32, name="sine2")(h)
            y = jnp.sin(30.0 * y)
            # reference quirk: raw channel-major view, not patchwise
            s = p * int(math.sqrt(l))
            y = y.reshape(b, self.channels, s, s)
            return y.transpose(0, 2, 3, 1)
        if self.mode == "identity":
            return x
        raise NotImplementedError(f"to_pixel mode {self.mode!r}")


class _DeconvParams(nn.Module):
    din: int
    cout: int
    p: int

    @nn.compact
    def __call__(self):
        w = self.param("kernel", _convtranspose_kaiming(self.cout, self.p),
                       (self.din, self.cout, self.p, self.p))
        b = self.param("bias", _uniform(1.0 / math.sqrt(self.cout * self.p * self.p)),
                       (self.cout,))
        return w, b


class ViTBackbone(nn.Module):
    """Patch embed + cls token + pos embed + pre-norm blocks + final norm.

    ``num_extra_tokens`` appends non-image tokens (latents) AFTER pos-embed
    handling — callers compose the sequence; this module just owns params and
    the block stack."""

    img_size: int = 256
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    init_values: Optional[float] = 1e-5
    pre_norm: bool = False  # True for CLIP
    lora_rank: int = 0
    lat_lora: bool = False  # adapters on qkv/proj too, latent-only deltas
    lora_latent_tokens: int = 0
    dtype: jnp.dtype = jnp.float32
    use_rope: bool = False
    num_latent_tokens: int = 0  # only used by rope blocks
    remat: bool = False  # activation checkpointing per block

    @property
    def grid(self):
        return self.img_size // self.patch_size

    @property
    def num_patches(self):
        return self.grid * self.grid

    def setup(self):
        d = self.embed_dim
        self.patch_proj = nn.Conv(
            d, (self.patch_size, self.patch_size),
            strides=self.patch_size, padding=0,
            dtype=self.dtype, param_dtype=jnp.float32, name="patch_embed",
        )
        self.cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, d))
        self.pos_embed = self.param(
            "pos_embed", trunc_normal(0.02), (1, 1 + self.num_patches, d)
        )
        self.blocks = [
            Block(self.num_heads, self.mlp_ratio, self.init_values,
                  self.lora_rank, lat_lora=self.lat_lora,
                  lora_latent_tokens=self.lora_latent_tokens,
                  dtype=self.dtype, use_rope=self.use_rope,
                  num_latent_tokens=self.num_latent_tokens,
                  num_image_tokens=self.num_patches,
                  name=f"block_{i}")
            for i in range(self.depth)
        ]
        self.norm = _ln("norm", self.dtype)
        if self.pre_norm:
            self.norm_pre = _ln("norm_pre", self.dtype)

    def patchify(self, img):  # NHWC -> (B, N, D)
        x = self.patch_proj(img.astype(self.dtype))
        b, h, w, d = x.shape
        return x.reshape(b, h * w, d)

    def resampled_pos_embed(self, grid_hw: tuple[int, int]):
        """timm resample_abs_pos_embed parity: antialiased-bicubic resize of
        the patch pos-embed grid; prefix (cls) entry kept as-is. fp32, static."""
        pe = self.pos_embed.astype(jnp.float32)
        prefix, patch = pe[:, :1], pe[:, 1:]
        g = self.grid
        if grid_hw == (g, g):
            return prefix, patch
        patch = patch.reshape(1, g, g, -1)
        patch = resize(patch, grid_hw, "bicubic_aa")
        return prefix, patch.reshape(1, grid_hw[0] * grid_hw[1], -1)

    def pos_embed_tokens(self, x, grid_hw: Optional[tuple[int, int]] = None,
                         keep_cls: bool = True):
        """Reference ``model._pos_embed`` (vision_transformer.py:815-848):
        prepend cls token, add (possibly grid-resampled) pos embed. fp32."""
        b = x.shape[0]
        x = x.astype(jnp.float32)
        if grid_hw is None:
            prefix, patch = self.pos_embed[:, :1], self.pos_embed[:, 1:]
        else:
            prefix, patch = self.resampled_pos_embed(grid_hw)
        cls = jnp.broadcast_to(self.cls_token.astype(jnp.float32), (b, 1, x.shape[-1]))
        x = jnp.concatenate([cls, x], axis=1)
        pe = jnp.concatenate([prefix, patch], axis=1)
        x = x + pe
        if not keep_cls:
            x = x[:, 1:]
        return x

    def run_blocks(self, x, mask=None):
        x = x.astype(self.dtype)
        if self.pre_norm:
            x = self.norm_pre(x)
        for blk in self.blocks:
            if self.remat:
                # trade FLOPs for HBM (reference use_checkpoint /
                # grad_ckpt flags; here via jax rematerialization)
                x = nn.remat(type(blk).__call__)(blk, x, mask)
            else:
                x = blk(x, mask)
        return self.norm(x)

    def __call__(self, img):
        """Plain ViT forward_features: (B,H,W,3) -> (B, 1+N, D) normed tokens."""
        x = self.patchify(img)
        x = self.pos_embed_tokens(x)
        return self.run_blocks(x)


def _backbone_kwargs(model_name: str, img_size: int, patch_size: int,
                     lora_rank: int, dtype) -> dict:
    preset = dict(VIT_PRESETS[model_name])
    return dict(
        img_size=img_size,
        patch_size=patch_size,
        embed_dim=preset["embed_dim"],
        depth=preset["depth"],
        num_heads=preset["num_heads"],
        init_values=preset.get("init_values", 1e-5),
        pre_norm=preset.get("pre_norm", False),
        lora_rank=lora_rank,
        dtype=dtype,
    )


class LatentEncoder(nn.Module):
    """DINOv2Encoder parity (dino_enc/dinov2.py:18): ViT over
    [cls, patches, latent tokens]; returns the trailing latent tokens.

    abs_pos_embed: latent tokens get image-style 2D pos embeddings resampled
    to the latent grid, plus a level embedding separating image rows from each
    PQ branch's latent rows (dinov2.py:86-100)."""

    model_name: str = "vit_base_patch14_dinov2.lvd142m"
    img_size: int = 256
    patch_size: int = 16
    num_latent_tokens: int = 256  # total (already scaled by product_quant)
    product_quant: int = 1
    abs_pos_embed: bool = True
    # full | frozen | lora | lat_lora (freezing handled by the optimizer)
    tuning_method: str = "full"
    lora_rank: int = 0
    use_attn_mask: bool = False  # forced True by lat_lora (dinov2.py:74)
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def embed_dim(self):
        return VIT_PRESETS[self.model_name]["embed_dim"]

    @property
    def attn_masked(self):
        return self.use_attn_mask or self.tuning_method == "lat_lora"

    def setup(self):
        if self.tuning_method not in ("full", "frozen", "lora", "lat_lora"):
            raise NotImplementedError(
                f"tuning_method={self.tuning_method!r}")
        rank = self.lora_rank if self.tuning_method in ("lora", "lat_lora") else 0
        self.model = ViTBackbone(
            **_backbone_kwargs(self.model_name, self.img_size, self.patch_size,
                               rank, self.dtype), remat=self.remat,
            lat_lora=self.tuning_method == "lat_lora",
            lora_latent_tokens=self.num_latent_tokens,
            name="model",
        )
        d = self.embed_dim
        self.latent_tokens = self.param(
            "latent_tokens", nn.initializers.normal(1e-6), (1, self.num_latent_tokens, d)
        )
        if self.abs_pos_embed:
            self.lvl_embed = self.param(
                "lvl_embed", trunc_normal(math.sqrt(1 / d / 3)),
                (1 + self.product_quant, d),
            )
        else:
            self.latent_pos_embed = self.param(
                "latent_pos_embed", trunc_normal(0.02), (1, self.num_latent_tokens, d)
            )

    def __call__(self, img):  # NHWC in [-1, 1]-normalized space
        b = img.shape[0]
        m = self.model
        x = m.patchify(img)
        x = m.pos_embed_tokens(x)  # (B, 1+N, D) fp32

        z = jnp.broadcast_to(
            self.latent_tokens.astype(jnp.float32),
            (b, self.num_latent_tokens, self.embed_dim),
        )
        if self.abs_pos_embed:
            nl = self.num_latent_tokens // self.product_quant
            g = int(math.sqrt(nl))
            assert g * g == nl, "num_latent_tokens/PQ must be a square"
            pieces = [x]
            for i in range(self.product_quant):
                zi = z[:, i * nl:(i + 1) * nl]
                zi = m.pos_embed_tokens(zi, grid_hw=(g, g), keep_cls=False)
                pieces.append(zi)
            x = jnp.concatenate(pieces, axis=1)
            lvl_ids = jnp.concatenate(
                [jnp.zeros((m.num_patches + 1,), jnp.int32)]
                + [jnp.full((nl,), i + 1, jnp.int32) for i in range(self.product_quant)]
            )
            x = x + jnp.take(self.lvl_embed.astype(jnp.float32), lvl_ids, axis=0)[None]
        else:
            x = jnp.concatenate([x, z + self.latent_pos_embed.astype(jnp.float32)], axis=1)

        mask = None
        if self.attn_masked:
            # prefix+image tokens cannot attend TO the latent tokens
            # (dinov2.py:105-112): shared additive (1,1,L,L) bias
            total = x.shape[1]
            nl = self.num_latent_tokens
            row = jnp.arange(total)[:, None]
            col = jnp.arange(total)[None, :]
            blocked = (row < total - nl) & (col >= total - nl)
            mask = jnp.where(blocked, -jnp.inf, 0.0).astype(jnp.float32)
            mask = mask[None, None]

        x = m.run_blocks(x, mask)
        return x[:, -self.num_latent_tokens:]  # (B, nlt, D)


class LatentDecoder(nn.Module):
    """DINOv2Decoder parity (dino_enc/dinov2.py:201): mask tokens at image
    positions + quantized latents; returns unpatchified pixels (NHWC)."""

    model_name: str = "vit_base_patch14_dinov2.lvd142m"
    img_size: int = 256
    patch_size: int = 16
    num_latent_tokens: int = 256  # per-branch (=total/product_quant)
    abs_pos_embed: bool = True
    to_pixel: str = "linear"
    tuning_method: str = "full"
    lora_rank: int = 0
    out_channels: int = 3
    use_rope: bool = False
    cond_latent: bool = False  # mask-token conditioning on pooled latents
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def embed_dim(self):
        return VIT_PRESETS[self.model_name]["embed_dim"]

    def setup(self):
        if self.to_pixel not in ("linear", "conv", "siren", "identity"):
            raise NotImplementedError(f"to_pixel={self.to_pixel!r}")
        rank = self.lora_rank if self.tuning_method in ("lora", "lat_lora") else 0
        self.model = ViTBackbone(
            **_backbone_kwargs(self.model_name, self.img_size, self.patch_size,
                               rank, self.dtype),
            use_rope=self.use_rope,
            num_latent_tokens=self.num_latent_tokens if self.use_rope else 0,
            lat_lora=self.tuning_method == "lat_lora",
            # decoder latent stream = z block (+ its extra cls when abs pos)
            lora_latent_tokens=self.num_latent_tokens
            + (1 if (self.abs_pos_embed and not self.use_rope) else 0),
            remat=self.remat,
            name="model",
        )
        d = self.embed_dim
        self.mask_token = self.param("mask_token", nn.initializers.normal(1e-6), (1, 1, d))
        if self.use_rope:
            pass  # rope replaces absolute positions (dinov2.py:261,333-339)
        elif self.abs_pos_embed:
            self.lvl_embed = self.param("lvl_embed", trunc_normal(math.sqrt(1 / d / 3)), (2, d))
        else:
            self.latent_pos_embed = self.param(
                "latent_pos_embed", trunc_normal(0.02), (1, self.num_latent_tokens, d)
            )
        self.pixel_head = ToPixel(self.img_size, self.patch_size, self.out_channels,
                                  mode=self.to_pixel, name="to_pixel")
        if self.cond_latent:
            d = self.embed_dim
            # timm Mlp(d, d, norm_layer=LayerNorm): fc1 -> gelu -> norm -> fc2
            self.cl_mlp1_fc1 = nn.Dense(d, param_dtype=jnp.float32, name="cl_mlp1_fc1")
            self.cl_mlp1_norm = nn.LayerNorm(epsilon=1e-6, name="cl_mlp1_norm")
            self.cl_mlp1_fc2 = nn.Dense(d, param_dtype=jnp.float32, name="cl_mlp1_fc2")
            self.cl_mlp2_fc1 = nn.Dense(d, param_dtype=jnp.float32, name="cl_mlp2_fc1")
            self.cl_mlp2_norm = nn.LayerNorm(epsilon=1e-6, name="cl_mlp2_norm")
            self.cl_mlp2_fc2 = nn.Dense(d, param_dtype=jnp.float32, name="cl_mlp2_fc2")
            self.cl_norm1 = nn.LayerNorm(epsilon=1e-6, name="cl_norm1")

    # adaptive-GAN-weight anchor (reference DINOv2Decoder.last_layer)
    @property
    def last_layer_param_path(self):
        head = {"linear": ("proj", "kernel"), "conv": ("deconv", "kernel"),
                "siren": ("sine2", "kernel"), "identity": None}[self.to_pixel]
        return None if head is None else ("to_pixel",) + head

    def __call__(self, z, *, train: bool = False, return_prelast: bool = False):  # (B, nlt, D)
        b = z.shape[0]
        m = self.model
        x = jnp.broadcast_to(
            self.mask_token.astype(jnp.float32), (b, m.num_patches, self.embed_dim)
        )
        z = z.astype(jnp.float32)
        if self.use_rope:
            # rope path: cls + mask tokens without positional adds, latents
            # appended raw (dinov2.py:333-342)
            cls = jnp.broadcast_to(m.cls_token.astype(jnp.float32),
                                   (b, 1, self.embed_dim))
            x = jnp.concatenate([cls, x, z], axis=1)
            x = m.run_blocks(x)
            x = x[:, 1:m.num_patches + 1]
            out = self.pixel_head(x)
            return (out, x) if return_prelast else out
        x = m.pos_embed_tokens(x)  # (B, 1+N, D)
        if self.cond_latent:
            # latent-pooled conditioning of the mask tokens (dinov2.py:323-325)
            zm = jnp.mean(z, axis=1, keepdims=True)
            h1 = self.cl_mlp1_fc2(self.cl_mlp1_norm(
                gelu_exact(self.cl_mlp1_fc1(zm))))
            ffnout = x + h1
            h2 = self.cl_mlp2_fc2(self.cl_mlp2_norm(
                gelu_exact(self.cl_mlp2_fc1(self.cl_norm1(ffnout)))))
            x = x + h2
        if self.abs_pos_embed:
            g = int(math.sqrt(self.num_latent_tokens))
            assert g * g == self.num_latent_tokens
            # reference quirk: cls is prepended to the latent stream and kept
            z = m.pos_embed_tokens(z, grid_hw=(g, g), keep_cls=True)
            x = jnp.concatenate([x, z], axis=1)
            lvl_ids = jnp.concatenate([
                jnp.zeros((m.num_patches + 1,), jnp.int32),
                jnp.ones((self.num_latent_tokens + 1,), jnp.int32),
            ])
            x = x + jnp.take(self.lvl_embed.astype(jnp.float32), lvl_ids, axis=0)[None]
        else:
            z = z + self.latent_pos_embed.astype(jnp.float32)
            x = jnp.concatenate([x, z], axis=1)

        x = m.run_blocks(x)
        x = x[:, 1:m.num_patches + 1]  # image-position outputs
        out = self.pixel_head(x)
        if return_prelast:
            return out, x
        return out
