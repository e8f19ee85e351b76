"""Helpers to load the read-only upstream reference (PUBLIC UNTRUSTED CODE —
imported only to produce golden values for parity tests; never copied)."""

import os
import sys

import numpy as np
import torch
import torch.distributed as tdist

REF = "/root/reference"


def ref_path():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if not tdist.is_initialized():
        import socket

        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
        os.environ["MASTER_ADDR"] = "127.0.0.1"
        os.environ["MASTER_PORT"] = str(port)
        tdist.init_process_group("gloo", rank=0, world_size=1)
    return REF


def make_stub(name, **attrs):
    """A sys.modules stub with a real ModuleSpec: importlib.util.find_spec
    raises ValueError on in-sys.modules modules whose __spec__ is None
    (transformers probes for a "datasets" package this way at import time,
    so a bare ModuleType stub poisons any later `import transformers`)."""
    import importlib.machinery
    import types

    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)
    return sys.modules[name]


def stub_heavy_modules():
    """Stub timm/peft/torchvision-dependent modules so pure-torch reference
    files import offline."""
    _stub = make_stub

    _stub("timm")
    _stub("timm.models", create_model=lambda *a, **k: None)
    _stub("wandb")
    _stub("tokenizer.tokenizer_image.dino_enc")
    _stub("tokenizer.tokenizer_image.dino_enc.dinov2",
          DINOv2Encoder=object, DINOv2Decoder=object)
    _stub("datasets", Denormalize=lambda *a, **k: (lambda x: x),
          Normalize=lambda *a, **k: (lambda x: x))


def t2n(x):
    return x.detach().cpu().numpy()


def conv_to_flax(conv):
    """torch Conv2d (out,in,kh,kw) -> flax NHWC kernel (kh,kw,in,out) + bias."""
    return {
        "kernel": t2n(conv.weight).transpose(2, 3, 1, 0),
        "bias": t2n(conv.bias),
    }


def nchw(x_nhwc):
    return np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2))


def nhwc(x_nchw):
    return np.ascontiguousarray(np.transpose(np.asarray(x_nchw), (0, 2, 3, 1)))
