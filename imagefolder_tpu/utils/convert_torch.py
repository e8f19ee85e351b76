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
    "convert_maskgit_uvit",
    "export_vqmodel",
    "export_rar",
    "export_var",
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
    """quant_resi.{qresi_ls|qresi}.N Phi convs -> phi_bank params.

    Indices may be sparse: with share_quant_resi=K phis but fewer scales
    than K, the ticks mapping (quant.py:285) can skip a phi entirely — flax
    then materializes no params for it, and round-tripped checkpoints carry
    only the used indices."""
    if f"{prefix}quant_resi.qresi.weight" in sd:  # fully shared: one phi
        return {"phi_0": {"Conv_0": conv_p(sd, f"{prefix}quant_resi.qresi")}}
    phis = {}
    for i in range(64):
        for probe in (f"{prefix}quant_resi.qresi_ls.{i}",
                      f"{prefix}quant_resi.{i}"):
            if f"{probe}.weight" in sd:
                phis[f"phi_{i}"] = {"Conv_0": conv_p(sd, probe)}
                break
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


def convert_vit_backbone(sd: Mapping, prefix: str, depth=None,
                         has_ls: bool = True, pre_norm: bool = False):
    """timm VisionTransformer state dict -> models.vit.ViTBackbone params.

    ``patch_embed`` is optional: the decoder backbone never embeds pixels
    (it consumes mask tokens + quantized latents, dinov2.py:313), so its
    flax tree carries no patch_embed even though the reference keeps the
    unused timm weights around. ``depth=None`` auto-detects the block count
    from the state dict."""
    g = lambda k: f"{prefix}{k}"

    def ln(key):
        return {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}

    p = {
        "cls_token": _np(sd[g("cls_token")]),
        "pos_embed": _np(sd[g("pos_embed")]),
        "norm": ln(g("norm")),
    }
    if f"{prefix}patch_embed.proj.weight" in sd:
        p["patch_embed"] = conv_p(sd, g("patch_embed.proj"))
    if pre_norm and f"{prefix}norm_pre.weight" in sd:
        p["norm_pre"] = ln(g("norm_pre"))
    i = 0
    while (depth is None and f"{prefix}blocks.{i}.norm1.weight" in sd) \
            or (depth is not None and i < depth):
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
        i += 1
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
        # the decoder never embeds pixels (mask tokens + latents in,
        # dinov2.py:313); drop the reference's unused timm patch_embed
        dec["model"].pop("patch_embed", None)
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


def convert_maskgit_uvit(sd: Mapping, depth: int, prefix: str = ""):
    """Reference UViTBert state dict (RAR/maskgit.py:209-287) ->
    models.maskgit.MaskGIT(arch='uvit') params."""
    g = lambda k: f"{prefix}{k}"

    def ln(key):
        return {"scale": _np(sd[f"{key}.weight"]),
                "bias": _np(sd[f"{key}.bias"])}

    def block(key, skip=False):
        p = {
            "norm1": ln(g(f"{key}.norm1")),
            "norm2": ln(g(f"{key}.norm2")),
            "qkv": linear_p(sd, g(f"{key}.attn.qkv")),
            "proj": linear_p(sd, g(f"{key}.attn.proj")),
            "fc1": linear_p(sd, g(f"{key}.mlp.fc1")),
            "fc2": linear_p(sd, g(f"{key}.mlp.fc2")),
        }
        if skip:
            p["skip_linear"] = linear_p(sd, g(f"{key}.skip_linear"))
        return p

    assert depth % 2 == 0, "uvit arch needs an even depth"
    half = depth // 2
    p = {
        "embeddings": _np(sd[g("embeddings.weight")]),
        "pos_embed": _np(sd[g("pos_embed")]),
        "mid_block": block("mid_block"),
        "final_norm": ln(g("norm")),
        "lm_head": linear_p(sd, g("lm_head")),
    }
    for i in range(half):
        p[f"in_block_{i}"] = block(f"in_blocks.{i}")
        p[f"out_block_{i}"] = block(f"out_blocks.{i}", skip=True)
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


# --------------------------------------------------------------------------- #
# jax -> torch export (the reverse mappings; reference BaseModel
# save_pretrained_weight semantics, RAR/modules/base_model.py:15-127).
# Every exporter is the exact inverse of its convert_* counterpart, so
# convert_*(export_*(params)) == params leaf-for-leaf — verified for every
# published config schema by `scripts/verify_zoo.py --all_schemas`.
# --------------------------------------------------------------------------- #

def _put_conv(sd: dict, key: str, p: Mapping):
    sd[f"{key}.weight"] = _np(p["kernel"]).transpose(3, 2, 0, 1)
    if "bias" in p:
        sd[f"{key}.bias"] = _np(p["bias"])


def _put_linear(sd: dict, key: str, p: Mapping):
    sd[f"{key}.weight"] = _np(p["kernel"]).T
    if "bias" in p:
        sd[f"{key}.bias"] = _np(p["bias"])


def _put_norm(sd: dict, key: str, p: Mapping):
    sd[f"{key}.weight"] = _np(p["norm"]["scale"])
    sd[f"{key}.bias"] = _np(p["norm"]["bias"])


def _put_ln(sd: dict, key: str, p: Mapping):
    sd[f"{key}.weight"] = _np(p["scale"])
    sd[f"{key}.bias"] = _np(p["bias"])


def _put_dense_as_1x1(sd: dict, key: str, p: Mapping):
    sd[f"{key}.weight"] = _np(p["kernel"]).T[:, :, None, None]
    if "bias" in p:
        sd[f"{key}.bias"] = _np(p["bias"])


def _put_res_block(sd, key, p):
    _put_norm(sd, f"{key}.norm1", p["norm1"])
    _put_conv(sd, f"{key}.conv1", p["conv1"])
    _put_norm(sd, f"{key}.norm2", p["norm2"])
    _put_conv(sd, f"{key}.conv2", p["conv2"])
    if "nin_shortcut" in p:
        _put_conv(sd, f"{key}.nin_shortcut", p["nin_shortcut"])


def _put_attn_block(sd, key, p):
    _put_norm(sd, f"{key}.norm", p["norm"])
    for n in ("q", "k", "v", "proj_out"):
        _put_conv(sd, f"{key}.{n}", p[n])


def export_cnn_encoder(p: Mapping, prefix: str = "encoder.",
                       ch_mult=(1, 1, 2, 2, 4), num_res_blocks: int = 2):
    sd: dict = {}
    g = lambda k: f"{prefix}{k}"
    num_res = len(ch_mult)
    _put_conv(sd, g("conv_in"), p["conv_in"])
    for i in range(num_res):
        for j in range(num_res_blocks):
            _put_res_block(sd, g(f"conv_blocks.{i}.res.{j}"), p[f"res_{i}_{j}"])
            if i == num_res - 1:
                _put_attn_block(sd, g(f"conv_blocks.{i}.attn.{j}"),
                                p[f"attn_{i}_{j}"])
        if i != num_res - 1:
            _put_conv(sd, g(f"conv_blocks.{i}.downsample.conv"),
                      p[f"down_{i}"]["conv"])
    _put_res_block(sd, g("mid.0"), p["mid_res_0"])
    _put_attn_block(sd, g("mid.1"), p["mid_attn"])
    _put_res_block(sd, g("mid.2"), p["mid_res_1"])
    _put_norm(sd, g("norm_out"), p["norm_out"])
    _put_conv(sd, g("conv_out"), p["conv_out"])
    return sd


def export_cnn_decoder(p: Mapping, prefix: str = "decoder.",
                       ch_mult=(1, 1, 2, 2, 4), num_res_blocks: int = 2):
    sd: dict = {}
    g = lambda k: f"{prefix}{k}"
    num_res = len(ch_mult)
    _put_conv(sd, g("conv_in"), p["conv_in"])
    _put_res_block(sd, g("mid.0"), p["mid_res_0"])
    _put_attn_block(sd, g("mid.1"), p["mid_attn"])
    _put_res_block(sd, g("mid.2"), p["mid_res_1"])
    for li, i_level in enumerate(reversed(range(num_res))):
        for j in range(num_res_blocks + 1):
            _put_res_block(sd, g(f"conv_blocks.{li}.res.{j}"), p[f"res_{li}_{j}"])
            if i_level == num_res - 1:
                _put_attn_block(sd, g(f"conv_blocks.{li}.attn.{j}"),
                                p[f"attn_{li}_{j}"])
        if li != num_res - 1:
            _put_conv(sd, g(f"conv_blocks.{li}.upsample.conv"),
                      p[f"up_{li}"]["conv"])
    _put_norm(sd, g("norm_out"), p["norm_out"])
    _put_conv(sd, g("conv_out"), p["conv_out"])
    return sd


def export_vit_backbone(p: Mapping, prefix: str):
    sd: dict = {}
    g = lambda k: f"{prefix}{k}"
    if "patch_embed" in p:  # the decoder backbone has none (see convert)
        _put_conv(sd, g("patch_embed.proj"), p["patch_embed"])
    sd[g("cls_token")] = _np(p["cls_token"])
    sd[g("pos_embed")] = _np(p["pos_embed"])
    _put_ln(sd, g("norm"), p["norm"])
    if "norm_pre" in p:
        _put_ln(sd, g("norm_pre"), p["norm_pre"])
    i = 0
    while f"block_{i}" in p:
        b = p[f"block_{i}"]
        _put_ln(sd, g(f"blocks.{i}.norm1"), b["norm1"])
        _put_ln(sd, g(f"blocks.{i}.norm2"), b["norm2"])
        _put_linear(sd, g(f"blocks.{i}.attn.qkv"), b["attn"]["qkv"])
        _put_linear(sd, g(f"blocks.{i}.attn.proj"), b["attn"]["proj"])
        _put_linear(sd, g(f"blocks.{i}.mlp.fc1"), b["mlp"]["fc1"]["base"])
        _put_linear(sd, g(f"blocks.{i}.mlp.fc2"), b["mlp"]["fc2"]["base"])
        if "ls1" in b:
            sd[g(f"blocks.{i}.ls1.gamma")] = _np(b["ls1"])
            sd[g(f"blocks.{i}.ls2.gamma")] = _np(b["ls2"])
        i += 1
    return sd


def _export_phi_bank(sd: dict, p: Mapping, prefix: str, share_quant_resi: int):
    """phi_bank -> reference quant_resi naming (quant.py:29-38: 0 ->
    PhiNonShared `quant_resi.{i}`, 1 -> PhiShared `quant_resi.qresi`,
    k>1 -> PhiPartiallyShared `quant_resi.qresi_ls.{i}`). Indices may be
    sparse (a phi skipped by the ticks mapping has no flax params); unused
    upstream phis then stay at their torch init — they are never applied."""
    for name, phi in p["phi_bank"].items():
        i = int(name.split("_")[1])
        conv = phi["Conv_0"]
        if share_quant_resi == 1:
            _put_conv(sd, f"{prefix}quant_resi.qresi", conv)
        elif share_quant_resi == 0:
            _put_conv(sd, f"{prefix}quant_resi.{i}", conv)
        else:
            _put_conv(sd, f"{prefix}quant_resi.qresi_ls.{i}", conv)


def _export_quantizer(p: Mapping, prefix: str, margs):
    sd: dict = {}
    if margs.lfq:
        _export_phi_bank(sd, p, prefix, margs.share_quant_resi)
    elif len(margs.v_patch_nums) == 1:
        sd[f"{prefix}embedding.weight"] = _np(p["codebook"])
    else:
        sd[f"{prefix}embedding.weight"] = _np(p["codebook"])
        _export_phi_bank(sd, p, prefix, margs.share_quant_resi)
    return sd


def export_vqmodel(params: Mapping, margs, usage_ema=None) -> dict:
    """flax VQModel params -> reference-layout torch state dict (the inverse
    of :func:`convert_vqmodel`). ``usage_ema`` optionally fills the
    reference's per-scale ``ema_vocab_hit_SV`` buffer (zeros otherwise — it
    only matters for continued training upstream, quant.py:41)."""
    sd: dict = {}
    _put_dense_as_1x1(sd, "quant_conv", params["quant_conv"])
    _put_dense_as_1x1(sd, "post_quant_conv", params["post_quant_conv"])
    if margs.enc_type == "cnn":
        sd.update(export_cnn_encoder(params["encoder"], "encoder.",
                                     tuple(margs.encoder_ch_mult)))
    else:
        enc = params["encoder"]
        sd.update(export_vit_backbone(enc["model"], "encoder.model."))
        sd["encoder.latent_tokens"] = _np(enc["latent_tokens"])
        if "lvl_embed" in enc:
            sd["encoder.lvl_embed.weight"] = _np(enc["lvl_embed"])
        if "latent_pos_embed" in enc:
            sd["encoder.latent_pos_embed"] = _np(enc["latent_pos_embed"])
    if margs.dec_type == "cnn":
        sd.update(export_cnn_decoder(params["decoder"], "decoder.",
                                     tuple(margs.decoder_ch_mult)))
    else:
        dec = params["decoder"]
        sd.update(export_vit_backbone(dec["model"], "decoder.model."))
        sd["decoder.mask_token"] = _np(dec["mask_token"])
        if "lvl_embed" in dec:
            sd["decoder.lvl_embed.weight"] = _np(dec["lvl_embed"])
        if "latent_pos_embed" in dec:
            sd["decoder.latent_pos_embed"] = _np(dec["latent_pos_embed"])
        tp = dec["to_pixel"]
        if "proj" not in tp:
            raise NotImplementedError(
                "export supports the 'linear' ToPixel head (the zoo layout); "
                f"got head params {sorted(tp)}")
        _put_linear(sd, "decoder.to_pixel.model", tp["proj"])
    n_scales = len(margs.v_patch_nums)
    # single-scale VectorQuantizer keeps a flat (V,) hit buffer
    # (xqgan_model.py:739); MSRQ keeps (S, V) (quant.py:41)
    buf_shape = ((margs.codebook_size,) if n_scales == 1
                 else (n_scales, margs.codebook_size))

    def _usage(i):
        if usage_ema is None:
            return np.zeros(buf_shape, np.float32)
        return _np(usage_ema[i]).reshape(buf_shape)

    if margs.product_quant > 1:
        for i in range(margs.product_quant):
            sd.update(_export_quantizer(params[f"quantize_{i}"],
                                        f"quantizes.{i}.", margs))
            if not margs.lfq:
                sd[f"quantizes.{i}.ema_vocab_hit_SV"] = _usage(i)
    else:
        sd.update(_export_quantizer(params["quantize"], "quantize.", margs))
        if not margs.lfq:
            sd["quantize.ema_vocab_hit_SV"] = _usage(0)
    if "semantic_model" in params:
        sd.update(export_vit_backbone(params["semantic_model"],
                                      "semantic_model."))
    if "detail_model" in params:
        sd.update(export_vit_backbone(params["detail_model"], "detail_model."))
    if "sem_linear" in params:
        _put_linear(sd, "sem_linear", params["sem_linear"])
    return sd


def export_rar(params: Mapping, prefix: str = "") -> dict:
    """flax RAR params -> reference RAR state dict (inverse of
    :func:`convert_rar`; the layout BaseModel.save_pretrained_weight writes,
    RAR/modules/base_model.py:52-81)."""
    sd: dict = {}
    g = lambda k: f"{prefix}{k}"
    sd[g("cls_token")] = _np(params["cls_token"])
    sd[g("embeddings.weight")] = _np(params["embeddings"])
    sd[g("pos_embed")] = _np(params["pos_embed"])
    sd[g("target_aware_pos_embed")] = _np(params["target_aware_pos_embed"])
    sd[g("timesteps_embeddings")] = _np(params["timesteps_embeddings"])
    _put_linear(sd, g("adaln_before_head.adaLN_modulation.1"),
                params["final_ada"])
    _put_linear(sd, g("lm_head"), params["lm_head"])
    i = 0
    while f"block_{i}" in params:
        b = params[f"block_{i}"]
        _put_linear(sd, g(f"blocks.{i}.adaLN_modulation.1"), b["adaLN"])
        _put_ln(sd, g(f"blocks.{i}.norm1"), b["norm1"])
        _put_ln(sd, g(f"blocks.{i}.norm2"), b["norm2"])
        _put_linear(sd, g(f"blocks.{i}.attn.qkv"), b["attn"]["qkv"])
        _put_linear(sd, g(f"blocks.{i}.attn.proj"), b["attn"]["proj"])
        _put_ln(sd, g(f"blocks.{i}.attn.q_norm"), b["attn"]["q_norm"])
        _put_ln(sd, g(f"blocks.{i}.attn.k_norm"), b["attn"]["k_norm"])
        _put_linear(sd, g(f"blocks.{i}.mlp.fc1"), b["fc1"])
        _put_linear(sd, g(f"blocks.{i}.mlp.fc2"), b["fc2"])
        i += 1
    return sd


def export_var(params: Mapping, prefix: str = "") -> dict:
    """flax VAR params -> reference VAR state dict (inverse of
    :func:`convert_var`)."""
    sd: dict = {}
    g = lambda k: f"{prefix}{k}"
    _put_linear(sd, g("word_embed"), params["word_embed"])
    sd[g("class_emb.weight")] = _np(params["class_emb"])
    sd[g("pos_start")] = _np(params["pos_start"])
    sd[g("pos_1LC")] = _np(params["pos_1LC"])
    sd[g("lvl_embed.weight")] = _np(params["lvl_embed"])
    _put_linear(sd, g("head_nm.ada_lin.1"), params["head_nm"]["ada_lin"])
    _put_linear(sd, g("head"), params["head"])
    if "empty_emb" in params:
        sd[g("empty_emb.weight")] = _np(params["empty_emb"])
    if "shared_ada_lin" in params:
        _put_linear(sd, g("shared_ada_lin.1"), params["shared_ada_lin"])
    i = 0
    while f"block_{i}" in params:
        b = params[f"block_{i}"]
        a = b["attn"]
        sd[g(f"blocks.{i}.attn.mat_qkv.weight")] = _np(a["mat_qkv"]["kernel"]).T
        sd[g(f"blocks.{i}.attn.q_bias")] = _np(a["q_bias"])
        sd[g(f"blocks.{i}.attn.v_bias")] = _np(a["v_bias"])
        _put_linear(sd, g(f"blocks.{i}.attn.proj"), a["proj"])
        _put_linear(sd, g(f"blocks.{i}.ffn.fc1"), b["ffn"]["fc1"])
        _put_linear(sd, g(f"blocks.{i}.ffn.fc2"), b["ffn"]["fc2"])
        if "scale_mul" in a:
            sd[g(f"blocks.{i}.attn.scale_mul_1H11")] = _np(a["scale_mul"])
        if "ada_gss" in b:
            sd[g(f"blocks.{i}.ada_gss")] = _np(b["ada_gss"])
        if "ada_lin" in b:
            _put_linear(sd, g(f"blocks.{i}.ada_lin.1"), b["ada_lin"])
        i += 1
    return sd
