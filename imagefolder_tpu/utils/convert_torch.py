"""PyTorch-checkpoint -> flax-params conversion for the reference model zoo.

Maps reference state_dict layouts (``tokenizer/tokenizer_image/xqgan_model.py``,
``quant.py``, ``lookup_free_quantize.py``) onto this package's module trees so
published XQ-GAN/ImageFolder/RobustTok weights load bit-compatibly.

Conventions:
  torch Conv2d  (O, I, kh, kw) -> flax NHWC kernel (kh, kw, I, O)
  torch Linear  (O, I)         -> flax kernel (I, O)
  torch GroupNorm weight/bias  -> flax scale/bias
  torch Embedding weight       -> codebook
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

__all__ = [
    "conv_p",
    "linear_p",
    "norm_p",
    "convert_cnn_encoder",
    "convert_cnn_decoder",
    "convert_msvq",
    "convert_lfq",
    "convert_single_vq",
]


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def conv_p(sd: Mapping, key: str):
    out = {"kernel": _np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def linear_p(sd: Mapping, key: str):
    out = {"kernel": _np(sd[f"{key}.weight"]).T}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def norm_p(sd: Mapping, key: str):
    return {"norm": {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}}


def _res_block(sd, key):
    p = {
        "norm1": norm_p(sd, f"{key}.norm1"),
        "conv1": conv_p(sd, f"{key}.conv1"),
        "norm2": norm_p(sd, f"{key}.norm2"),
        "conv2": conv_p(sd, f"{key}.conv2"),
    }
    if f"{key}.nin_shortcut.weight" in sd:
        p["nin_shortcut"] = conv_p(sd, f"{key}.nin_shortcut")
    return p


def _attn_block(sd, key):
    return {
        "norm": norm_p(sd, f"{key}.norm"),
        "q": conv_p(sd, f"{key}.q"),
        "k": conv_p(sd, f"{key}.k"),
        "v": conv_p(sd, f"{key}.v"),
        "proj_out": conv_p(sd, f"{key}.proj_out"),
    }


def convert_cnn_encoder(sd: Mapping, prefix: str = "encoder.",
                        ch_mult=(1, 1, 2, 2, 4), num_res_blocks: int = 2):
    """Reference Encoder (xqgan_model.py:454) -> models.cnn.Encoder params."""
    g = lambda k: f"{prefix}{k}"
    num_res = len(ch_mult)
    p = {"conv_in": conv_p(sd, g("conv_in"))}
    for i in range(num_res):
        for j in range(num_res_blocks):
            p[f"res_{i}_{j}"] = _res_block(sd, g(f"conv_blocks.{i}.res.{j}"))
            if i == num_res - 1:
                p[f"attn_{i}_{j}"] = _attn_block(sd, g(f"conv_blocks.{i}.attn.{j}"))
        if i != num_res - 1:
            p[f"down_{i}"] = {"conv": conv_p(sd, g(f"conv_blocks.{i}.downsample.conv"))}
    p["mid_res_0"] = _res_block(sd, g("mid.0"))
    p["mid_attn"] = _attn_block(sd, g("mid.1"))
    p["mid_res_1"] = _res_block(sd, g("mid.2"))
    p["norm_out"] = norm_p(sd, g("norm_out"))
    p["conv_out"] = conv_p(sd, g("conv_out"))
    return p


def convert_cnn_decoder(sd: Mapping, prefix: str = "decoder.",
                        ch_mult=(1, 1, 2, 2, 4), num_res_blocks: int = 2):
    """Reference Decoder (xqgan_model.py:518) -> models.cnn.Decoder params.
    Reference stores upsampling blocks already in reversed (low->high res)
    order, matching our list index."""
    g = lambda k: f"{prefix}{k}"
    num_res = len(ch_mult)
    p = {"conv_in": conv_p(sd, g("conv_in"))}
    p["mid_res_0"] = _res_block(sd, g("mid.0"))
    p["mid_attn"] = _attn_block(sd, g("mid.1"))
    p["mid_res_1"] = _res_block(sd, g("mid.2"))
    for li, i_level in enumerate(reversed(range(num_res))):
        for j in range(num_res_blocks + 1):
            p[f"res_{li}_{j}"] = _res_block(sd, g(f"conv_blocks.{li}.res.{j}"))
            if i_level == num_res - 1:
                p[f"attn_{li}_{j}"] = _attn_block(sd, g(f"conv_blocks.{li}.attn.{j}"))
        if li != num_res - 1:
            p[f"up_{li}"] = {"conv": conv_p(sd, g(f"conv_blocks.{li}.upsample.conv"))}
    p["norm_out"] = norm_p(sd, g("norm_out"))
    p["conv_out"] = conv_p(sd, g("conv_out"))
    return p


def _phi_bank(sd: Mapping, prefix: str):
    """quant_resi.{qresi_ls|qresi}.N Phi convs -> phi_bank params."""
    phis = {}
    i = 0
    while True:
        for probe in (f"{prefix}quant_resi.qresi_ls.{i}.weight",
                      f"{prefix}quant_resi.qresi.weight" if i == 0 else None,
                      f"{prefix}quant_resi.{i}.weight"):
            if probe is not None and probe in sd:
                key = probe[: -len(".weight")]
                phis[f"phi_{i}"] = {"Conv_0": conv_p(sd, key)}
                break
        else:
            break
        if f"{prefix}quant_resi.qresi.weight" in sd:
            break  # fully shared: single phi
        i += 1
    return phis


def convert_msvq(sd: Mapping, prefix: str = "quantize."):
    """Reference VectorQuantizer2 -> ops.quantize.MultiScaleVQ params."""
    return {
        "codebook": _np(sd[f"{prefix}embedding.weight"]),
        "phi_bank": _phi_bank(sd, prefix),
    }


def convert_lfq(sd: Mapping, prefix: str = "quantize."):
    """Reference LFQ -> ops.quantize.MultiScaleLFQ params (phi convs only —
    LFQ has no learned codebook)."""
    return {"phi_bank": _phi_bank(sd, prefix)}


def convert_single_vq(sd: Mapping, prefix: str = "quantize."):
    """Reference VectorQuantizer -> ops.quantize.SingleVQ params."""
    return {"codebook": _np(sd[f"{prefix}embedding.weight"])}


def conv1x1_to_dense(sd: Mapping, key: str):
    """torch 1x1 Conv2d -> Dense params (NHWC channel projection)."""
    out = {"kernel": _np(sd[f"{key}.weight"])[:, :, 0, 0].T}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def convert_vit_backbone(sd: Mapping, prefix: str, depth: int,
                         has_ls: bool = True, pre_norm: bool = False):
    """timm VisionTransformer state dict -> models.vit.ViTBackbone params."""
    g = lambda k: f"{prefix}{k}"

    def ln(key):
        return {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}

    p = {
        "patch_embed": conv_p(sd, g("patch_embed.proj")),
        "cls_token": _np(sd[g("cls_token")]),
        "pos_embed": _np(sd[g("pos_embed")]),
        "norm": ln(g("norm")),
    }
    if pre_norm and f"{prefix}norm_pre.weight" in sd:
        p["norm_pre"] = ln(g("norm_pre"))
    for i in range(depth):
        b = {
            "norm1": ln(g(f"blocks.{i}.norm1")),
            "norm2": ln(g(f"blocks.{i}.norm2")),
            "attn": {"qkv": linear_p(sd, g(f"blocks.{i}.attn.qkv")),
                     "proj": linear_p(sd, g(f"blocks.{i}.attn.proj"))},
            "mlp": {"fc1": {"base": linear_p(sd, g(f"blocks.{i}.mlp.fc1"))},
                    "fc2": {"base": linear_p(sd, g(f"blocks.{i}.mlp.fc2"))}},
        }
        if has_ls and f"{prefix}blocks.{i}.ls1.gamma" in sd:
            b["ls1"] = _np(sd[g(f"blocks.{i}.ls1.gamma")])
            b["ls2"] = _np(sd[g(f"blocks.{i}.ls2.gamma")])
        p[f"block_{i}"] = b
    return p


def convert_vqmodel(sd: Mapping, margs) -> dict:
    """Full reference VQModel state dict -> flax params tree for
    models.tokenizer.VQModel (the HF-zoo checkpoint loader)."""
    from imagefolder_tpu.models.vit import VIT_PRESETS

    sd = {k.replace("module.", "").replace("_orig_mod.", ""): v
          for k, v in sd.items()}
    p: dict = {
        "quant_conv": conv1x1_to_dense(sd, "quant_conv"),
        "post_quant_conv": conv1x1_to_dense(sd, "post_quant_conv"),
    }
    if margs.enc_type == "cnn":
        p["encoder"] = convert_cnn_encoder(sd, "encoder.",
                                           tuple(margs.encoder_ch_mult))
    else:
        depth = VIT_PRESETS[margs.encoder_model]["depth"]
        enc = {"model": convert_vit_backbone(sd, "encoder.model.", depth)}
        enc["latent_tokens"] = _np(sd["encoder.latent_tokens"])
        if "encoder.lvl_embed.weight" in sd:
            enc["lvl_embed"] = _np(sd["encoder.lvl_embed.weight"])
        if "encoder.latent_pos_embed" in sd:
            enc["latent_pos_embed"] = _np(sd["encoder.latent_pos_embed"])
        p["encoder"] = enc
    if margs.dec_type == "cnn":
        p["decoder"] = convert_cnn_decoder(sd, "decoder.",
                                           tuple(margs.decoder_ch_mult))
    else:
        depth = VIT_PRESETS[margs.decoder_model]["depth"]
        dec = {"model": convert_vit_backbone(sd, "decoder.model.", depth)}
        dec["mask_token"] = _np(sd["decoder.mask_token"])
        if "decoder.lvl_embed.weight" in sd:
            dec["lvl_embed"] = _np(sd["decoder.lvl_embed.weight"])
        if "decoder.latent_pos_embed" in sd:
            dec["latent_pos_embed"] = _np(sd["decoder.latent_pos_embed"])
        dec["to_pixel"] = {"proj": linear_p(sd, "decoder.to_pixel.model")}
        p["decoder"] = dec
    # quantizers
    if margs.product_quant > 1:
        for i in range(margs.product_quant):
            pref = f"quantizes.{i}."
            if margs.lfq:
                p[f"quantize_{i}"] = convert_lfq(sd, pref)
            elif len(margs.v_patch_nums) == 1:
                p[f"quantize_{i}"] = convert_single_vq(sd, pref)
            else:
                p[f"quantize_{i}"] = convert_msvq(sd, pref)
    else:
        if margs.lfq:
            p["quantize"] = convert_lfq(sd, "quantize.")
        elif len(margs.v_patch_nums) == 1:
            p["quantize"] = convert_single_vq(sd, "quantize.")
        else:
            p["quantize"] = convert_msvq(sd, "quantize.")
    # frozen teachers, if present in the checkpoint
    if margs.semantic_guide == "dinov2" and "semantic_model.cls_token" in sd:
        depth = VIT_PRESETS[margs.encoder_model]["depth"]
        p["semantic_model"] = convert_vit_backbone(sd, "semantic_model.", depth)
    if margs.detail_guide != "none" and "detail_model.cls_token" in sd:
        p["detail_model"] = convert_vit_backbone(sd, "detail_model.", 12,
                                                 has_ls=False, pre_norm=True)
    if "sem_linear.weight" in sd:
        p["sem_linear"] = linear_p(sd, "sem_linear")
    return p


def convert_rar(sd: Mapping, depth: int, prefix: str = ""):
    """Reference RAR state dict (RAR/rar.py) -> models.rar.RAR params."""
    g = lambda k: f"{prefix}{k}"

    def ln(key):
        return {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}

    p = {
        "cls_token": _np(sd[g("cls_token")]),
        "embeddings": _np(sd[g("embeddings.weight")]),
        "pos_embed": _np(sd[g("pos_embed")]),
        "target_aware_pos_embed": _np(sd[g("target_aware_pos_embed")]),
        "timesteps_embeddings": _np(sd[g("timesteps_embeddings")]),
        "final_ada": linear_p(sd, g("adaln_before_head.adaLN_modulation.1")),
        "lm_head": linear_p(sd, g("lm_head")),
    }
    for i in range(depth):
        p[f"block_{i}"] = {
            "adaLN": linear_p(sd, g(f"blocks.{i}.adaLN_modulation.1")),
            "norm1": ln(g(f"blocks.{i}.norm1")),
            "norm2": ln(g(f"blocks.{i}.norm2")),
            "attn": {
                "qkv": linear_p(sd, g(f"blocks.{i}.attn.qkv")),
                "proj": linear_p(sd, g(f"blocks.{i}.attn.proj")),
                "q_norm": ln(g(f"blocks.{i}.attn.q_norm")),
                "k_norm": ln(g(f"blocks.{i}.attn.k_norm")),
            },
            "fc1": linear_p(sd, g(f"blocks.{i}.mlp.fc1")),
            "fc2": linear_p(sd, g(f"blocks.{i}.mlp.fc2")),
        }
    return p


def convert_var(sd: Mapping, depth: int, prefix: str = "",
                shared_aln: bool = False, attn_l2_norm: bool = False,
                mlm: bool = True):
    """Reference VAR state dict (models/var.py) -> models.var.VAR params."""
    g = lambda k: f"{prefix}{k}"
    p = {
        "word_embed": linear_p(sd, g("word_embed")),
        "class_emb": _np(sd[g("class_emb.weight")]),
        "pos_start": _np(sd[g("pos_start")]),
        "pos_1LC": _np(sd[g("pos_1LC")]),
        "lvl_embed": _np(sd[g("lvl_embed.weight")]),
        "head_nm": {"ada_lin": linear_p(sd, g("head_nm.ada_lin.1"))},
        "head": linear_p(sd, g("head")),
    }
    if mlm and g("empty_emb.weight") in sd:
        p["empty_emb"] = _np(sd[g("empty_emb.weight")])
    if shared_aln:
        p["shared_ada_lin"] = linear_p(sd, g("shared_ada_lin.1"))
    for i in range(depth):
        b = {
            "attn": {
                "mat_qkv": {"kernel": _np(sd[g(f"blocks.{i}.attn.mat_qkv.weight")]).T},
                "q_bias": _np(sd[g(f"blocks.{i}.attn.q_bias")]),
                "v_bias": _np(sd[g(f"blocks.{i}.attn.v_bias")]),
                "proj": linear_p(sd, g(f"blocks.{i}.attn.proj")),
            },
            "ffn": {"fc1": linear_p(sd, g(f"blocks.{i}.ffn.fc1")),
                    "fc2": linear_p(sd, g(f"blocks.{i}.ffn.fc2"))},
        }
        if attn_l2_norm:
            b["attn"]["scale_mul"] = _np(sd[g(f"blocks.{i}.attn.scale_mul_1H11")])
        if shared_aln:
            b["ada_gss"] = _np(sd[g(f"blocks.{i}.ada_gss")])
        else:
            b["ada_lin"] = linear_p(sd, g(f"blocks.{i}.ada_lin.1"))
        p[f"block_{i}"] = b
    return p
