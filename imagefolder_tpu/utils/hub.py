"""Checkpoint interchange: jax params <-> torch/safetensors files.

Reference ``RAR/modules/base_model.py:15-127`` (``BaseModel``): models save
``save_pretrained_weight(path)`` as either a safetensors file or a torch
``.bin``, load with ``load_pretrained_weight``, both keyed by the torch
module's state-dict layout. This module reproduces that interchange for the
flax param trees: the reverse converters (``utils/convert_torch.py``
``export_*``) produce the exact reference layouts, so a checkpoint written
here loads in the upstream repo (and HF hub tooling) and vice versa.

Formats by suffix:
  ``.safetensors`` — safetensors numpy (no torch needed to write)
  ``.bin`` / ``.pt`` / ``.pth`` — ``torch.save`` of a tensor state dict
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Mapping, Optional

import numpy as np

__all__ = ["save_pretrained_weight", "load_pretrained_weight",
           "save_pretrained", "load_state_dict_file"]

_KINDS = {"vqmodel", "rar", "var"}


def _flat_sd(kind: str, params: Mapping, margs=None) -> dict:
    from imagefolder_tpu.utils import convert_torch as ct

    if kind == "vqmodel":
        if margs is None:
            raise ValueError("vqmodel export needs the ModelArgs")
        return ct.export_vqmodel(params, margs)
    if kind == "rar":
        return ct.export_rar(params)
    if kind == "var":
        return ct.export_var(params)
    raise ValueError(f"kind must be one of {_KINDS}, got {kind!r}")


def save_pretrained_weight(path, params: Mapping, kind: str,
                           margs=None) -> Path:
    """Write flax ``params`` as a reference-layout weight file
    (base_model.py:52-81 ``save_pretrained_weight``)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    sd = _flat_sd(kind, params, margs)
    sd = {k: np.ascontiguousarray(v) for k, v in sd.items()}
    if path.suffix == ".safetensors":
        from safetensors.numpy import save_file

        save_file(sd, str(path))
    elif path.suffix in {".bin", ".pt", ".pth"}:
        import torch

        torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)
    else:
        raise ValueError(f"unknown weight suffix {path.suffix!r} "
                         "(.safetensors/.bin/.pt/.pth)")
    return path


def load_state_dict_file(path) -> dict:
    """Read a torch/safetensors weight file into a flat numpy state dict
    (base_model.py:83-127 ``load_pretrained_weight`` file handling)."""
    path = Path(path)
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file

        return dict(load_file(str(path)))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict):
        for k in ("ema", "model", "state_dict"):
            if k in sd:
                sd = sd[k]
                break
    return {k: v.detach().cpu().numpy() if hasattr(v, "detach") else v
            for k, v in sd.items() if hasattr(v, "shape")}


def load_pretrained_weight(path, kind: str, margs=None, depth: int = 24,
                           shared_aln: bool = False,
                           attn_l2_norm: bool = True) -> dict:
    """Weight file (either direction's layout) -> flax params tree."""
    from imagefolder_tpu.utils import convert_torch as ct

    sd = load_state_dict_file(path)
    if kind == "vqmodel":
        return ct.convert_vqmodel(sd, margs)
    if kind == "rar":
        return ct.convert_rar(sd, depth)
    if kind == "var":
        return ct.convert_var(sd, depth, shared_aln=shared_aln,
                              attn_l2_norm=attn_l2_norm)
    raise ValueError(f"kind must be one of {_KINDS}, got {kind!r}")


def save_pretrained(directory, params: Mapping, kind: str, margs=None,
                    config: Optional[dict] = None) -> Path:
    """HF-style directory: ``model.safetensors`` + ``config.json``
    (base_model.py:15-50 ``save_pretrained``)."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    save_pretrained_weight(directory / "model.safetensors", params, kind,
                           margs)
    (directory / "config.json").write_text(
        json.dumps({"model_kind": kind, **(config or {})}, indent=1))
    return directory
