"""Offline pretokenization of ImageNet for RAR training (reference
``scripts/pretokenization.py``): encode each train image (ten-crop x10 or
center+hflip x2) to final-scale token ids, write ``pretokenized.jsonl`` rows
of ``{"class_id": int, "tokens": [...]}``.

Usage:
    python scripts/pretokenize.py --config configs/RobustTok.yaml \
        --vq_ckpt <orbax-or-torch ckpt> --data_path ... --output out.jsonl
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from imagefolder_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import jax
import jax.numpy as jnp
import numpy as np


def crops_for(img_hwc: np.ndarray, mode: str, size: int):
    """center+hflip (x2) or ten-crop (x10) (pretokenization.py:165-186)."""
    crops = []
    if mode == "center":
        crops = [img_hwc, img_hwc[:, ::-1]]
    else:  # ten_crop: 4 corners + center, and flips
        h, w = img_hwc.shape[:2]
        offs = [(0, 0), (0, w - size), (h - size, 0), (h - size, w - size),
                ((h - size) // 2, (w - size) // 2)]
        for oy, ox in offs:
            c = img_hwc[oy:oy + size, ox:ox + size]
            crops.extend([c, c[:, ::-1]])
    return [np.ascontiguousarray(c) for c in crops]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--vq_ckpt", required=True)
    ap.add_argument("--data_path", default=None)
    ap.add_argument("--output", default="pretokenized.jsonl")
    ap.add_argument("--crop_mode", choices=["center", "ten_crop"],
                    default="center")
    ap.add_argument("--batch_size", type=int, default=64)
    from imagefolder_tpu.parallel.mesh import add_distributed_args, init_from_args

    add_distributed_args(ap)
    args = ap.parse_args()
    init_from_args(args)

    from imagefolder_tpu.data.imagenet import center_crop_arr, list_image_folder
    from imagefolder_tpu.models.tokenizer import VQModel
    from imagefolder_tpu.utils.ckpt import CheckpointManager
    from imagefolder_tpu.utils.config import load_tokenizer_config
    from PIL import Image

    # code extraction is argmax-sensitive: force fp32 activations like the
    # reference's autocast-free pretokenization.py (and our eval/verify CLIs)
    margs, _, run = load_tokenizer_config(args.config,
                                          {"dtype_str": "float32"})
    data_path = args.data_path or run.data_path
    model = VQModel(margs)

    # load tokenizer weights (orbax dir with 'params' tree, or torch .pt)
    params = _load_params(args.vq_ckpt, model, margs)

    enc = jax.jit(lambda p, x: model.apply(
        {"params": p}, x, method=VQModel.encode_to_tokens))

    files, labels, _ = list_image_folder(data_path)
    # per-rank slice + rank-0 merge (reference pretokenization.py:218-254
    # writes pretokenized_{rank}.json, rank 0 merges to one jsonl)
    rank, nproc = jax.process_index(), jax.process_count()
    if nproc > 1:
        files, labels = files[rank::nproc], labels[rank::nproc]
        part_path = f"{args.output}.rank{rank}"
    else:
        part_path = args.output
    out = open(part_path, "w")
    batch_imgs, batch_labels = [], []

    def flush():
        if not batch_imgs:
            return
        x = jnp.asarray(np.stack(batch_imgs)) / 127.5 - 1.0
        toks = np.asarray(enc(params, x))
        for t, lb in zip(toks, batch_labels):
            out.write(json.dumps({"class_id": int(lb),
                                  "tokens": t.tolist()}) + "\n")
        batch_imgs.clear()
        batch_labels.clear()

    for f, lb in zip(files, labels):
        img = Image.open(f).convert("RGB")
        base = center_crop_arr(
            img, margs.image_size if args.crop_mode == "center"
            else margs.image_size + 32)
        for c in crops_for(base.astype(np.float32), args.crop_mode,
                           margs.image_size):
            batch_imgs.append(c[:margs.image_size, :margs.image_size])
            batch_labels.append(lb)
            if len(batch_imgs) >= args.batch_size:
                flush()
    flush()
    out.close()
    if nproc > 1:
        from imagefolder_tpu.parallel.mesh import sync_global_devices

        sync_global_devices("pretokenize")
        if rank != 0:
            return
        with open(args.output, "w") as merged:
            for i in range(nproc):
                with open(f"{args.output}.rank{i}") as part:
                    merged.write(part.read())
    print(f"wrote {args.output}")


def _load_params(path: str, model, margs):
    p = Path(path)
    if p.suffix in {".pt", ".pth", ".bin", ".safetensors"}:
        from imagefolder_tpu.utils.convert_torch import convert_vqmodel
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(sd, dict):
            for k in ("ema", "model", "state_dict"):
                if k in sd:
                    sd = sd[k]
                    break
        return convert_vqmodel(sd, margs)
    # orbax
    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(p)
    return restored["params"] if "params" in restored else restored


if __name__ == "__main__":
    main()
