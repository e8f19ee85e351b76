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
