"""Export a trained checkpoint to the reference/HF interchange formats
(reference ``RAR/modules/base_model.py:15-127`` BaseModel save_pretrained):

    # tokenizer -> upstream-loadable .pt / .safetensors
    python scripts/export_weights.py --kind vqmodel \
        --config configs/VQ-4096.yaml \
        --ckpt output/run/ckpts/20000/default --out XQGAN-4096.safetensors

    # RAR -> rar-b.bin (the zoo's layout, RobustTok-README.md:17)
    python scripts/export_weights.py --kind rar \
        --ckpt output/rar/ckpts/250000/default --out rar-b.bin --use_ema

    # HF-style directory (model.safetensors + config.json)
    python scripts/export_weights.py --kind rar --ckpt ... --out rar_b/ --hf

Input may be an orbax checkpoint directory (train state or bare params) or
an existing torch/safetensors file (format conversion).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from imagefolder_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def _load_tree(path: str, use_ema: bool):
    p = Path(path)
    if p.suffix in {".pt", ".pth", ".bin", ".safetensors"}:
        return None  # handled as a flat state dict by the caller
    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(p.absolute())
    if use_ema and restored.get("ema_params") is not None:
        return restored["ema_params"]
    return restored.get("params", restored)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", required=True, choices=["vqmodel", "rar", "var"])
    ap.add_argument("--ckpt", required=True,
                    help="orbax checkpoint dir, or a torch/safetensors file")
    ap.add_argument("--out", required=True,
                    help=".safetensors/.bin/.pt path, or a directory "
                         "with --hf")
    ap.add_argument("--config", default=None,
                    help="tokenizer yaml (required for --kind vqmodel)")
    ap.add_argument("--depth", type=int, default=24,
                    help="generator depth (rar/var import from torch files)")
    ap.add_argument("--use_ema", action="store_true",
                    help="export the EMA weights when the checkpoint has "
                         "them (the zoo's RAR checkpoints are EMA)")
    ap.add_argument("--hf", action="store_true",
                    help="write an HF-style directory (model.safetensors + "
                         "config.json)")
    args = ap.parse_args()

    from imagefolder_tpu.utils.hub import (
        load_pretrained_weight,
        save_pretrained,
        save_pretrained_weight,
    )

    margs = None
    if args.kind == "vqmodel":
        if not args.config:
            ap.error("--kind vqmodel needs --config")
        from imagefolder_tpu.utils.config import load_tokenizer_config

        margs, _, _ = load_tokenizer_config(args.config)

    params = _load_tree(args.ckpt, args.use_ema)
    if params is None:  # torch/safetensors input: convert layouts
        params = load_pretrained_weight(args.ckpt, args.kind, margs,
                                        depth=args.depth)

    if args.hf:
        out = save_pretrained(args.out, params, args.kind, margs,
                              config={"source_ckpt": str(args.ckpt)})
    else:
        out = save_pretrained_weight(args.out, params, args.kind, margs)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
