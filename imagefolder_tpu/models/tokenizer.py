"""XQ-GAN tokenizer assembly (reference ``xqgan_model.py:75-451`` VQModel).

encoder -> quant_conv(1x1) -> PQ split -> per-branch quantizer -> concat ->
post_quant_conv(1x1) -> decoder, plus semantic/detail contrastive guides and
RobustTok latent perturbation.

TPU-first notes:
* NHWC / token-major layouts; 1x1 convs are Dense layers on the channel dim.
* Frozen teachers (DINOv2 semantic / CLIP detail) are plain ViT backbones
  whose params are frozen by optimizer label, not by module surgery.
* The forward is a pure function of (params, batch, rng, epoch); losses are
  returned, never logged from inside (reference logs from VQLoss.forward).
* One canonical tokenizer interface (the reference shipped three conflicting
  ones, see SURVEY §"quirks"): ``encode_to_tokens`` -> indices,
  ``decode_tokens`` -> image, plus the VAR APIs (img_to_idxBl,
  idxBl_to_var_input, get_next_autoregressive_input, fhat_to_img).
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from imagefolder_tpu.losses.clip_loss import clip_loss
from imagefolder_tpu.models.cnn import Decoder as CNNDecoder
from imagefolder_tpu.models.cnn import Encoder as CNNEncoder
from imagefolder_tpu.models.vit import (
    LatentDecoder,
    LatentEncoder,
    ViTBackbone,
    VIT_PRESETS,
    _backbone_kwargs,
)
from imagefolder_tpu.ops.perturb import add_perturbation
from imagefolder_tpu.ops.quantize import (
    MultiScaleLFQ,
    MultiScaleVQ,
    QuantOut,
    SingleVQ,
)
from imagefolder_tpu.utils.torch_init import linear_kaiming_uniform

__all__ = ["ModelArgs", "VQModel", "TokenizerOut", "VQ_models"]

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass
class ModelArgs:
    """Mirror of reference ModelArgs (xqgan_model.py:31-72); same defaults,
    same YAML keys."""

    codebook_size: int = 16384
    codebook_embed_dim: int = 8
    codebook_l2_norm: bool = True
    codebook_show_usage: bool = True
    commit_loss_beta: float = 0.25
    entropy_loss_ratio: float = 0.0

    encoder_ch_mult: Sequence[int] = (1, 1, 2, 2, 4)
    decoder_ch_mult: Sequence[int] = (1, 1, 2, 2, 4)
    z_channels: int = 256
    dropout_p: float = 0.0

    v_patch_nums: Sequence[int] = (1, 2, 3, 4, 5, 6, 8, 10, 13, 16)
    enc_type: str = "cnn"
    dec_type: str = "cnn"
    semantic_guide: str = "dinov2"
    detail_guide: str = "clip"
    num_latent_tokens: int = 256
    encoder_model: str = "vit_small_patch14_dinov2.lvd142m"
    decoder_model: str = "vit_small_patch14_dinov2.lvd142m"
    abs_pos_embed: bool = False
    share_quant_resi: int = 4
    product_quant: int = 1
    codebook_drop: float = 0.0
    half_sem: bool = False
    start_drop: int = 1
    sem_loss_weight: float = 0.1
    detail_loss_weight: float = 0.1
    clip_norm: bool = False
    sem_loss_scale: float = 1.0
    detail_loss_scale: float = 1.0
    guide_type_1: str = "class"
    guide_type_2: str = "class"

    lfq: bool = False
    scale: float = 1.0
    soft_entropy: bool = True

    dependency_loss_weight: float = 0.0

    test_model: bool = False

    # build knobs (not in reference ModelArgs)
    image_size: int = 256
    enc_tuning_method: str = "full"
    dec_tuning_method: str = "full"
    lora_rank: int = 8
    enc_use_attn_mask: bool = False  # dinov2.py:105-112 (forced by lat_lora)
    to_pixel: str = "linear"  # linear | conv | siren | identity
    perturb_delta_max: int = 0  # RobustTok: static top-k budget (config delta)
    remat: bool = False  # activation checkpointing on ViT blocks
    dtype_str: str = "float32"  # activation dtype: float32 | bfloat16

    @property
    def dtype(self):
        return jnp.bfloat16 if self.dtype_str == "bfloat16" else jnp.float32

    @property
    def total_latent_tokens(self) -> int:
        # reference scales num_latent_tokens by product_quant in-place
        # (xqgan_model.py:85); we keep the config value per-branch-total.
        return self.num_latent_tokens * self.product_quant


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TokenizerOut:
    """Training-forward outputs (reference forward's return tuple,
    xqgan_model.py:365)."""

    dec: jnp.ndarray                       # reconstruction, NHWC in [-1,1]
    vq_loss: jnp.ndarray
    commit_loss: jnp.ndarray
    entropy_loss: jnp.ndarray
    sem_loss: jnp.ndarray
    detail_loss: jnp.ndarray
    dependency_loss: jnp.ndarray
    hits_PSV: jnp.ndarray                  # (P, S, V) codebook hits
    pre_last: Optional[jnp.ndarray] = None  # decoder pre-last activation (train)

    def codebook_loss(self):
        """Matches reference loss composition (vq_loss.py:193-196)."""
        return (self.vq_loss, self.commit_loss, self.entropy_loss)


def _orthogonal_cosine_loss(a, b):
    """Decorrelate PQ branches (xqgan_model.py:836-840)."""
    a = a / (jnp.linalg.norm(a, axis=1, keepdims=True) + 1e-12)
    b = b / (jnp.linalg.norm(b, axis=1, keepdims=True) + 1e-12)
    return jnp.mean(jnp.sum(a * b, axis=1))


class VQModel(nn.Module):
    config: ModelArgs

    def setup(self):
        cfg = self.config
        dt = cfg.dtype
        self.grid = int(math.sqrt(cfg.num_latent_tokens))

        if cfg.enc_type == "cnn":
            self.encoder = CNNEncoder(
                ch_mult=tuple(cfg.encoder_ch_mult), z_channels=cfg.z_channels,
                dropout=cfg.dropout_p, dtype=dt, name="encoder",
            )
            enc_dim = cfg.z_channels
        elif cfg.enc_type == "dinov2":
            self.encoder = LatentEncoder(
                model_name=cfg.encoder_model, img_size=cfg.image_size,
                patch_size=16, num_latent_tokens=cfg.total_latent_tokens,
                product_quant=cfg.product_quant, abs_pos_embed=cfg.abs_pos_embed,
                tuning_method=cfg.enc_tuning_method, lora_rank=cfg.lora_rank,
                use_attn_mask=cfg.enc_use_attn_mask,
                remat=cfg.remat, dtype=dt, name="encoder",
            )
            enc_dim = self.encoder.embed_dim
        else:
            raise NotImplementedError(cfg.enc_type)

        # 1x1 convs are channel-dim Dense layers in NHWC/token layouts
        self.quant_conv = nn.Dense(
            cfg.codebook_embed_dim, kernel_init=linear_kaiming_uniform,
            param_dtype=jnp.float32, name="quant_conv",
        )

        if cfg.dec_type == "cnn":
            self.decoder = CNNDecoder(
                ch_mult=tuple(cfg.decoder_ch_mult), dropout=cfg.dropout_p,
                dtype=dt, name="decoder",
            )
            dec_dim = cfg.z_channels
        elif cfg.dec_type == "dinov2":
            self.decoder = LatentDecoder(
                model_name=cfg.decoder_model, img_size=cfg.image_size,
                patch_size=16, num_latent_tokens=cfg.num_latent_tokens,
                abs_pos_embed=cfg.abs_pos_embed, tuning_method=cfg.dec_tuning_method,
                lora_rank=cfg.lora_rank, to_pixel=cfg.to_pixel,
                remat=cfg.remat, dtype=dt, name="decoder",
            )
            dec_dim = self.decoder.embed_dim
        else:
            raise NotImplementedError(cfg.dec_type)
        self.post_quant_conv = nn.Dense(
            dec_dim, kernel_init=linear_kaiming_uniform,
            param_dtype=jnp.float32, name="post_quant_conv",
        )

        # quantizers: P parallel branches (PQ outer loop)
        def make_quantizer(i):
            name = f"quantize_{i}" if cfg.product_quant > 1 else "quantize"
            if len(cfg.v_patch_nums) == 1:
                return SingleVQ(cfg.codebook_size, cfg.codebook_embed_dim,
                                cfg.commit_loss_beta, cfg.codebook_l2_norm, name=name)
            if cfg.lfq:
                return MultiScaleLFQ(
                    codebook_size=cfg.codebook_size, Cvae=cfg.codebook_embed_dim,
                    v_patch_nums=tuple(cfg.v_patch_nums),
                    using_znorm=cfg.codebook_l2_norm,
                    num_latent_tokens=cfg.num_latent_tokens,
                    share_quant_resi=cfg.share_quant_resi,
                    codebook_drop=cfg.codebook_drop, scale=cfg.scale,
                    entropy_weight=cfg.entropy_loss_ratio,
                    soft_entropy=cfg.soft_entropy, name=name,
                )
            return MultiScaleVQ(
                vocab_size=cfg.codebook_size, Cvae=cfg.codebook_embed_dim,
                v_patch_nums=tuple(cfg.v_patch_nums), using_znorm=True,
                num_latent_tokens=cfg.num_latent_tokens,
                share_quant_resi=cfg.share_quant_resi,
                codebook_drop=cfg.codebook_drop, name=name,
            )

        self.quantizers = tuple(make_quantizer(i) for i in range(cfg.product_quant))

        # frozen teachers (semantic: encoder_model; detail: CLIP-B/16)
        if cfg.semantic_guide == "dinov2":
            self.semantic_model = ViTBackbone(
                **_backbone_kwargs(cfg.encoder_model, cfg.image_size, 16, 0, dt),
                name="semantic_model",
            )
            if cfg.enc_type == "cnn":
                self.sem_linear = nn.Dense(
                    cfg.codebook_embed_dim, kernel_init=linear_kaiming_uniform,
                    param_dtype=jnp.float32, name="sem_linear",
                )
        if cfg.detail_guide != "none":
            # reference builds a CLIP-B/16 teacher for ANY non-none value
            # (xqgan_model.py:209) and routes its 768-dim features through the
            # shared quant_conv — so the encoder must be 768-dim (vit_base),
            # as in every shipped config.
            if cfg.enc_type == "dinov2" and enc_dim != 768:
                raise ValueError(
                    "detail_guide requires a 768-dim encoder (vit_base_*): the "
                    "shared quant_conv projects both encoder tokens and CLIP "
                    "teacher features (reference xqgan_model.py:344)"
                )
            self.detail_model = ViTBackbone(
                **_backbone_kwargs("vit_base_patch16_clip_224.openai",
                                   cfg.image_size, 16, 0, dt),
                name="detail_model",
            )

    # ------------------------------------------------------------------ #
    @property
    def vocab_size(self):
        return self.config.codebook_size * self.config.product_quant

    @property
    def Cvae(self):
        return self.config.codebook_embed_dim * self.config.product_quant

    def _teacher_input(self, x):
        """[-1,1] -> ImageNet-normalized (xqgan_model.py:172-173,304)."""
        mean = jnp.asarray(_IMAGENET_MEAN)
        std = jnp.asarray(_IMAGENET_STD)
        return ((x.astype(jnp.float32) * 0.5 + 0.5) - mean) / std

    def encode(self, x) -> jnp.ndarray:
        """Image -> pre-quant latent grids: (B, P, g, g, C_codebook)."""
        cfg = self.config
        if cfg.enc_type == "cnn":
            h = self.encoder(x)  # (B, g, g, z)
            if h.shape[1] != self.grid:
                raise ValueError(
                    f"encoder output grid {h.shape[1]}x{h.shape[2]} != "
                    f"sqrt(num_latent_tokens)={self.grid} — check image_size "
                    f"({cfg.image_size}) vs encoder_ch_mult downsampling "
                    f"(f{2 ** (len(cfg.encoder_ch_mult) - 1)})")
            h = self.quant_conv(h)
            return h[:, None]  # P=1 axis
        tokens = self.encoder(x)  # (B, P*g*g, D)
        h = self.quant_conv(tokens)  # (B, P*g*g, C)
        b = h.shape[0]
        g = self.grid
        return h.reshape(b, cfg.product_quant, g, g, cfg.codebook_embed_dim)

    def decode(self, quant, return_prelast: bool = False) -> jnp.ndarray:
        """Concatenated quantized latents (B, g, g, P*C) -> image NHWC [-1,1].

        return_prelast additionally yields the pre-last-layer activation used
        by the adaptive disc weight (train.tokenizer_train.apply_last_layer)."""
        cfg = self.config
        q = self.post_quant_conv(quant)
        if cfg.dec_type == "cnn":
            return self.decoder(q, return_prelast=return_prelast)
        b, g1, g2, d = q.shape
        return self.decoder(q.reshape(b, g1 * g2, d), return_prelast=return_prelast)

    # ---------------------------- training ---------------------------- #
    def __call__(self, x, *, epoch=0, alpha: float = 0.0, beta: float = 0.0,
                 delta_ratio: float = 1.0, train: bool = False,
                 rng: Optional[jax.Array] = None) -> TokenizerOut:
        """Training forward (xqgan_model.py:268-365). alpha/beta/delta follow
        the RobustTok annealing; delta_max is static (config), the effective
        delta is scaled by ``delta_ratio`` at trace time."""
        cfg = self.config
        b = x.shape[0]
        h_P = self.encode(x)  # (B, P, g, g, C)

        if len(cfg.v_patch_nums) == 1 or rng is None:
            dropout_n = None
        else:
            rng, k = jax.random.split(rng)
            dropout_n = jax.random.randint(
                k, (b,), cfg.start_drop, len(cfg.v_patch_nums) + 1
            )

        outs: List[QuantOut] = []
        for i, qz in enumerate(self.quantizers):
            outs.append(qz(h_P[:, i], dropout_n=dropout_n, train=train))

        p = cfg.product_quant
        vq_loss = sum(o.vq_loss for o in outs) / p
        commit_loss = sum(o.commit_loss for o in outs) / p
        entropy_loss = sum(o.entropy_loss for o in outs) / p
        hits = jnp.stack([o.hits_SV for o in outs])

        quant_list = [o.f_hat for o in outs]
        if p > 1:
            dependency_loss = cfg.dependency_loss_weight * _orthogonal_cosine_loss(
                jnp.mean(quant_list[0], axis=(1, 2)),
                jnp.mean(quant_list[-1], axis=(1, 2)),
            )
        else:
            dependency_loss = jnp.zeros((), jnp.float32)
            # RobustTok latent perturbation (applied after vq/commit losses)
            if cfg.perturb_delta_max > 0 and rng is not None and train:
                rng, k = jax.random.split(rng)
                codebook = self.quantizers[0].codebook
                quant_list[0] = add_perturbation(
                    h_P[:, 0], quant_list[0], codebook,
                    alpha=alpha, beta=beta, delta=cfg.perturb_delta_max,
                    delta_eff=delta_ratio * cfg.perturb_delta_max, key=k,
                    codebook_norm=cfg.codebook_l2_norm,
                )

        quant = jnp.concatenate(quant_list, axis=-1)  # (B, g, g, P*C)
        if train:
            dec, pre_last = self.decode(quant, return_prelast=True)
        else:
            dec, pre_last = self.decode(quant), None

        sem_loss = jnp.zeros((), jnp.float32)
        detail_loss = jnp.zeros((), jnp.float32)
        n_drop = int(b * cfg.codebook_drop)
        tin = self._teacher_input(x)

        if cfg.semantic_guide == "dinov2":
            tokens = jax.lax.stop_gradient(self.semantic_model(tin))
            if cfg.guide_type_1 == "class":
                z_s = tokens[:, 0]  # cls pooled
            else:
                z_s = jnp.mean(tokens[:, 1:], axis=1)
            if cfg.enc_type == "dinov2":
                z_s = self.quant_conv(z_s)
                z_q = jnp.mean(quant_list[-1], axis=(1, 2))
            else:
                z_s = self.sem_linear(z_s)
                z_q = jnp.mean(h_P[:, 0], axis=(1, 2))
            sem_loss = self._guide_loss(
                z_s[n_drop:], z_q[n_drop:], cfg.sem_loss_scale, epoch
            ) * cfg.sem_loss_weight

        if cfg.detail_guide != "none":
            tokens = jax.lax.stop_gradient(self.detail_model(tin))
            # reference asserts guide_type_2 == 'patch' (xqgan_model.py:336);
            # its reshape scrambles positions but only the mean is used, and
            # mean commutes with the 1x1 conv — so this is exact.
            z_d = jnp.mean(tokens[:, 1:], axis=1)
            z_d = self.quant_conv(z_d)
            z_q = jnp.mean(quant_list[0], axis=(1, 2))
            detail_loss = self._guide_loss(
                z_d[n_drop:], z_q[n_drop:], cfg.detail_loss_scale, epoch
            ) * cfg.detail_loss_weight

        return TokenizerOut(
            dec=dec, vq_loss=vq_loss, commit_loss=commit_loss,
            entropy_loss=entropy_loss, sem_loss=sem_loss,
            detail_loss=detail_loss, dependency_loss=dependency_loss,
            hits_PSV=hits, pre_last=pre_last,
        )

    def _guide_loss(self, feat_t, feat_q, scale, epoch):
        """ClipLoss with optional clip_norm annealed logit scale
        (xqgan_model.py:321-331)."""
        cfg = self.config
        f1 = feat_t.astype(jnp.float32)
        f2 = feat_q.astype(jnp.float32)
        if cfg.clip_norm:
            f1 = f1 / (jnp.linalg.norm(f1, axis=1, keepdims=True) + 1e-12)
            f2 = f2 / (jnp.linalg.norm(f2, axis=1, keepdims=True) + 1e-12)
            e = jnp.asarray(epoch, jnp.float32)
            scale = jnp.where(
                e < 200.0, (e % 200) / 200.0 * (100.0 - scale) + scale, 100.0
            )
        return clip_loss(f1, f2, scale)

    # ---------------------------- inference --------------------------- #
    def _branch_fhats(self, x, v_patch_nums=None):
        h_P = self.encode(x)
        return [
            qz.f_to_idxBl_or_fhat(h_P[:, i], True, v_patch_nums)
            for i, qz in enumerate(self.quantizers)
        ]

    def img_to_reconstructed_img(self, x, last_one: bool = True):
        """Greedy encode + decode (xqgan_model.py:367-403), clamped [-1,1]."""
        fhats = self._branch_fhats(x)  # [P][S](B,g,g,C)
        per_scale = [jnp.concatenate(fs, axis=-1) for fs in zip(*fhats)]
        if last_one:
            return jnp.clip(self.decode(per_scale[-1]), -1.0, 1.0)
        return [jnp.clip(self.decode(f), -1.0, 1.0) for f in per_scale]

    def img_to_sem_feat(self, x):
        """Final-scale quantized feature of the semantic (last) branch
        (xqgan_model.py:405-426) — linear-probe input."""
        return self._branch_fhats(x)[-1][-1]

    def img_to_idxBl(self, x, v_patch_nums=None) -> List[List[jnp.ndarray]]:
        """Per-branch, per-scale token indices — the VAR teacher-forcing API
        the reference left undeclared on VQModel (SURVEY quirk #1)."""
        h_P = self.encode(x)
        return [
            qz.f_to_idxBl_or_fhat(h_P[:, i], False, v_patch_nums)
            for i, qz in enumerate(self.quantizers)
        ]

    def idxBl_to_var_input(self, gt_idx_Bl_P: List[List[jnp.ndarray]],
                           prog_si: int = -1):
        """(xqgan_model.py:434-439): concat per-branch teacher-forcing inputs
        on the channel dim. prog_si >= 0 truncates for progressive VAR
        training (quant.py:236-237); prog_si == 0 returns None (sos-only)."""
        if prog_si == 0:
            return None
        parts = [
            qz.idxBl_to_var_input(gt_idx_Bl_P[i], prog_si)
            for i, qz in enumerate(self.quantizers)
        ]
        return jnp.concatenate(parts, axis=-1)

    def get_next_autoregressive_input(self, si, sn, f_hat, h_BHWC):
        """(xqgan_model.py:441-451): chunk on channels, delegate per branch."""
        p = self.config.product_quant
        c = self.config.codebook_embed_dim
        f_outs, n_outs = [], []
        for i, qz in enumerate(self.quantizers):
            fo, no = qz.get_next_autoregressive_input(
                si, sn, f_hat[..., i * c:(i + 1) * c], h_BHWC[..., i * c:(i + 1) * c]
            )
            f_outs.append(fo)
            n_outs.append(no)
        return jnp.concatenate(f_outs, axis=-1), jnp.concatenate(n_outs, axis=-1)

    def fhat_to_img(self, f_hat):
        return jnp.clip(self.decode(f_hat), -1.0, 1.0)

    def embed_branch(self, i, idx, si: Optional[int] = None):
        qz = self.quantizers[i]
        if isinstance(qz, MultiScaleLFQ):
            return qz.embed(idx, si)
        return qz.embed(idx)

    def soft_embed_branch(self, i, probs):
        """``more_smooth`` mixture embedding (the original VAR recipe the
        reference documents at var.py:219-225): a (B, l, V) code
        distribution times the branch codebook instead of a hard lookup.
        LFQ/BSQ has no dense codebook — unsupported, as upstream."""
        qz = self.quantizers[i]
        if isinstance(qz, MultiScaleLFQ):
            raise NotImplementedError(
                "more_smooth requires a dense VQ codebook; LFQ/BSQ has none")
        cb = qz.codebook
        if getattr(qz, "codebook_norm", False):
            cb = cb / (jnp.linalg.norm(cb, axis=-1, keepdims=True) + 1e-12)
        return probs.astype(cb.dtype) @ cb

    # --------------------- canonical RAR interface --------------------- #
    def encode_to_tokens(self, x) -> jnp.ndarray:
        """Image -> flat (B, P*g*g) indices at the final scale (single-scale
        quantizers) — the pretokenization/RAR path."""
        idx = self.img_to_idxBl(x)
        return jnp.concatenate([branch[-1] for branch in idx], axis=1)

    def decode_tokens(self, tokens) -> jnp.ndarray:
        """Flat final-scale indices -> image (single-scale quantizers)."""
        cfg = self.config
        b = tokens.shape[0]
        g = self.grid
        p = cfg.product_quant
        per_branch = jnp.split(tokens, p, axis=1)
        quants = []
        for i, t in enumerate(per_branch):
            z = self.embed_branch(i, t.reshape(b, g, g))
            quants.append(z)
        return self.fhat_to_img(jnp.concatenate(quants, axis=-1))


def VQ_8(**kwargs):
    return VQModel(ModelArgs(encoder_ch_mult=(1, 2, 2, 4),
                             decoder_ch_mult=(1, 2, 2, 4), **kwargs))


def VQ_16(**kwargs):
    return VQModel(ModelArgs(encoder_ch_mult=(1, 1, 2, 2, 4),
                             decoder_ch_mult=(1, 1, 2, 2, 4), **kwargs))


VQ_models = {"VQ-16": VQ_16, "VQ-8": VQ_8}
