"""InceptionV3 feature extractor for FID/sFID/IS (flax, NHWC).

Architecture-exact rebuild of the FID-standard InceptionV3 (the pytorch-fid
port of the OpenAI TF1 ``classify_image_graph_def.pb`` used by the reference
``evaluator.py:587-629``): BasicConv2d = conv + BN(eps=1e-3) + relu, the FID
variants of blocks A/C/E (count_include_pad=False average pooling; E_2 uses
max-pool in the pool branch), 2048-d pool3 features, 1008-way logits for IS,
and the first 7 channels of the Mixed_6e map as "spatial" features for sFID.

Weights load from a pytorch-fid checkpoint via ``convert_inception_checkpoint``
(no network access needed at runtime).
"""

from __future__ import annotations

from typing import Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["InceptionV3", "convert_inception_checkpoint",
           "validate_inception_checkpoint", "inception_gate_status",
           "fabricate_inception_state_dict"]


class BasicConv2d(nn.Module):
    out: int
    kernel: tuple
    stride: int = 1
    padding: tuple = (0, 0)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out, self.kernel, strides=self.stride,
                    padding=[(p, p) for p in self.padding], use_bias=False,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         momentum=0.9, name="bn")(x)
        return nn.relu(x)


def _avg_pool3(x):
    """3x3 s1 avg pool, count_include_pad=False (FID blocks)."""
    ones = jnp.ones_like(x[..., :1])
    s = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
    c = nn.avg_pool(ones, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
    return s / c


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(_avg_pool3(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avg_pool3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    use_max_pool: bool = False  # E_2 (last block) uses max pool (pytorch-fid)

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.use_max_pool:
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        else:
            bp = _avg_pool3(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Input: NHWC float in [0, 1] at any size; resized (bilinear, like
    pytorch-fid) to 299 and scaled to [-1, 1]. Returns dict with pool3
    (N, 2048), spatial (N, 7*17*17) and logits (N, 1008)."""

    num_classes: int = 1008

    @nn.compact
    def __call__(self, x01):
        x = jax.image.resize(
            x01, (x01.shape[0], 299, 299, x01.shape[-1]), "bilinear")
        x = x * 2.0 - 1.0
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        spatial = x[..., :7]  # sFID features: first 7 channels @ 17x17
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(use_max_pool=True, name="Mixed_7c")(x)
        pool3 = jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> (N, 2048)
        logits = nn.Dense(self.num_classes, name="fc")(pool3)
        b = spatial.shape[0]
        return {
            "pool3": pool3,
            "spatial": spatial.transpose(0, 3, 1, 2).reshape(b, -1),
            "softmax": jax.nn.softmax(logits, axis=-1),
        }


def convert_inception_checkpoint(sd: Mapping) -> dict:
    """pytorch-fid InceptionV3 state dict -> flax {params, batch_stats}."""

    def _np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    params: dict = {}
    stats: dict = {}

    def put(tree, path, leaf):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf

    for key, v in sd.items():
        parts = key.split(".")
        if parts[0] == "fc":
            if parts[1] == "weight":
                put(params, ("fc", "kernel"), _np(v).T)
            else:
                put(params, ("fc", "bias"), _np(v))
            continue
        block, rest = parts[0], parts[1:]
        # e.g. Mixed_5b.branch1x1.conv.weight / .bn.{weight,bias,running_*}
        if rest[0] == "conv" or (len(rest) >= 2 and rest[-2] == "conv"):
            sub = rest[:-2]
            leaf = rest[-1]
            if leaf == "weight":
                put(params, (block, *sub, "conv", "kernel"),
                    _np(v).transpose(2, 3, 1, 0))
        elif "bn" in rest:
            i = rest.index("bn")
            sub = rest[:i]
            leaf = rest[-1]
            if leaf == "weight":
                put(params, (block, *sub, "bn", "scale"), _np(v))
            elif leaf == "bias":
                put(params, (block, *sub, "bn", "bias"), _np(v))
            elif leaf == "running_mean":
                put(stats, (block, *sub, "bn", "mean"), _np(v))
            elif leaf == "running_var":
                put(stats, (block, *sub, "bn", "var"), _np(v))
    return {"params": params, "batch_stats": stats}


def fabricate_inception_state_dict(seed: int = 0) -> dict:
    """Complete torch-style pytorch-fid state dict fabricated by inverting
    the converter mapping over the model's eval_shape tree.

    TEST/DEMO FIXTURE ONLY: the weights are random, so every FID computed
    through them is meaningless — this exists to drive the full rFID/gFID
    plumbing (converter -> InceptionV3 -> statistics -> Frechet) offline,
    where the real pytorch-fid asset cannot be downloaded (zero egress)."""
    from collections.abc import Mapping as _Mapping

    import jax

    model = InceptionV3()
    template = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                              jnp.zeros((1, 299, 299, 3)))
    rng = np.random.default_rng(seed)
    sd = {}

    def emit(shape, kind):
        if kind == "kernel":
            return rng.normal(0, 0.05, shape).astype(np.float32)
        if kind in ("scale", "var"):
            return rng.uniform(0.5, 1.5, shape).astype(np.float32)
        return rng.normal(0, 0.1, shape).astype(np.float32)

    def walk(tree, prefix):
        for k, v in tree.items():
            if isinstance(v, _Mapping):
                walk(v, prefix + [k])
                continue
            shape = tuple(v.shape)
            if prefix == ["fc"]:
                if k == "kernel":
                    sd["fc.weight"] = emit((shape[1], shape[0]), "kernel")
                else:
                    sd["fc.bias"] = emit(shape, "bias")
            elif prefix[-1] == "conv":  # (kh,kw,in,out) -> (out,in,kh,kw)
                key = ".".join(prefix[:-1] + ["conv", "weight"])
                kh, kw, cin, cout = shape
                sd[key] = emit((cout, cin, kh, kw), "kernel")
            elif prefix[-1] == "bn":
                name = {"scale": "weight", "bias": "bias",
                        "mean": "running_mean", "var": "running_var"}[k]
                sd[".".join(prefix[:-1] + ["bn", name])] = emit(shape, k)

    walk(template["params"], [])
    walk(template["batch_stats"], [])
    return sd


# ----------------------- real-weight validation gate ----------------------- #

def _gate_path():
    import os
    from pathlib import Path

    root = Path(os.environ.get(
        "IMGF_CACHE", Path.home() / ".cache" / "imagefolder_tpu"))
    return root / "inception_gate.json"


def _file_sha256(path, chunk=1 << 20):
    import hashlib

    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def _fixed_uint8_batch(n=8, size=299):
    """Deterministic procedural uint8 batch (gradients + checkers + noise) —
    the probe input whose activation statistics the gate records."""
    rng = np.random.default_rng(20260817)
    imgs = np.zeros((n, size, size, 3), np.uint8)
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    for i in range(n):
        if i % 3 == 0:
            img = ((xx * (i + 1) + yy) % 256)
        elif i % 3 == 1:
            img = (((xx // (8 + i)) + (yy // (8 + i))) % 2) * 255
        else:
            img = rng.integers(0, 256, (size, size))
        imgs[i] = np.stack([img, np.roll(img, i, 0), np.roll(img, i, 1)],
                           axis=-1).astype(np.uint8)
    return imgs


def inception_gate_status(ckpt_path=None):
    """Returns the recorded gate marker dict, or None if the real-weight
    validation has never run (or ran against a different checkpoint)."""
    import json

    p = _gate_path()
    if not p.exists():
        return None
    try:
        marker = json.loads(p.read_text())
    except Exception:
        return None
    if ckpt_path is not None and marker.get("sha256") != _file_sha256(ckpt_path):
        return None
    return marker


def validate_inception_checkpoint(ckpt_path, *, write_marker=True):
    """Real-weight validation gate for the Inception port (VERDICT r2 #8).

    Asserts on the published pytorch-fid checkpoint:
    1. converter coverage — every torch tensor consumed (except
       num_batches_tracked), every flax leaf of the model filled, shapes
       exact vs ``jax.eval_shape`` of the model init;
    2. live forward on a fixed procedural uint8 batch — pool3 (post-ReLU)
       non-negativity + plausible sparsity, softmax well-formed, and the
       activation statistics recorded for future drift checks.

    Writes the gate marker (checkpoint sha256 + stats) consumed by
    ``scripts/evaluate_fid.py``; FID/IS numbers are flagged untrusted until
    this has run once against the real checkpoint. Reference equivalent:
    the TF1 graph_def hash-pinned download (evaluator.py:587-598).
    """
    import json

    import torch

    sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    if not isinstance(sd, Mapping):
        sd = sd.state_dict()
    tensor_keys = {k for k, v in sd.items() if hasattr(v, "shape")}
    consumable = {k for k in tensor_keys if not k.endswith("num_batches_tracked")}

    variables = convert_inception_checkpoint(sd)

    # --- coverage both ways, shape-exact ---
    def leaves_with_path(tree):
        from flax.traverse_util import flatten_dict

        return {"/".join(k): v for k, v in flatten_dict(tree).items()}

    got = leaves_with_path(variables["params"])
    got.update({"bs/" + k: v
                for k, v in leaves_with_path(variables["batch_stats"]).items()})
    n_consumed = len(got)
    if n_consumed != len(consumable):
        raise AssertionError(
            f"converter coverage: consumed {n_consumed} leaves but the "
            f"checkpoint has {len(consumable)} tensors (minus "
            "num_batches_tracked) — converter drops weights silently")

    model = InceptionV3()
    template = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                              jnp.zeros((1, 299, 299, 3)))
    want = leaves_with_path(template["params"])
    want.update({"bs/" + k: v
                 for k, v in leaves_with_path(template["batch_stats"]).items()})
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    if missing or extra:
        raise AssertionError(
            f"converter/model tree mismatch: missing={missing[:5]} "
            f"extra={extra[:5]}")
    for k in want:
        if tuple(got[k].shape) != tuple(want[k].shape):
            raise AssertionError(
                f"shape mismatch at {k}: ckpt {got[k].shape} vs model "
                f"{want[k].shape}")

    # --- live forward on the fixed probe batch ---
    x = _fixed_uint8_batch()

    @jax.jit
    def feat(xu8):
        return model.apply(variables, xu8.astype(jnp.float32) / 255.0)

    out = jax.device_get(feat(jnp.asarray(x)))
    pool3, softmax = out["pool3"], out["softmax"]
    # explicit raises, not asserts: the trust marker must never be written
    # with the activation checks compiled away (python -O)
    if not (np.isfinite(pool3).all() and np.isfinite(softmax).all()):
        raise AssertionError("non-finite activations in validated forward")
    if pool3.min() < 0.0:
        raise AssertionError(
            "pool3 is post-ReLU — negatives mean a broken port")
    zero_frac = float((pool3 <= 0).mean())
    if not 0.05 < zero_frac < 0.95:
        raise AssertionError(
            f"pool3 sparsity {zero_frac:.2f} implausible for real weights")
    np.testing.assert_allclose(softmax.sum(-1), 1.0, rtol=1e-4)

    stats = {
        "sha256": _file_sha256(ckpt_path),
        "pool3_mean": float(pool3.mean()),
        "pool3_std": float(pool3.std()),
        "pool3_zero_frac": zero_frac,
        "spatial_mean": float(out["spatial"].mean()),
        "spatial_std": float(out["spatial"].std()),
        "softmax_top1_mean": float(softmax.max(-1).mean()),
        "probe_pool3_row0_head": [float(v) for v in pool3[0, :8]],
        "n_leaves": n_consumed,
    }
    if write_marker:
        p = _gate_path()
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(json.dumps(stats, indent=1))
    return stats
