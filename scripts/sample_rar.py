"""RAR/MaskGIT 50k-sample FID pipeline (reference ``sample_imagenet_rar.py``
+ ``demo_util.sample_fn``, model_type rar|maskgit): class-balanced labels ->
generate -> tokenizer.decode_tokens -> uint8 npz (+ optional FID if stats
provided). ``--model maskgit`` samples a ``train_rar.py --model maskgit``
checkpoint via iterative parallel decoding (``RAR/maskgit.py:111-193``).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from imagefolder_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True, help="tokenizer yaml")
    ap.add_argument("--vq_ckpt", required=True)
    ap.add_argument("--rar_ckpt", required=True)
    ap.add_argument("--model", choices=["rar", "maskgit"], default="rar")
    ap.add_argument("--maskgit_arch", choices=["bert", "uvit"],
                default="bert", help="MaskGIT trunk: ImageBert or UViTBert (RAR/maskgit.py:209)")
    ap.add_argument("--guidance_decay", default="constant",
                    choices=["constant", "linear", "power-cosine"])
    ap.add_argument("--num_sample_steps", type=int, default=8,
                    help="maskgit parallel-decode steps")
    ap.add_argument("--hidden", type=int, default=768)
    ap.add_argument("--depth", type=int, default=24)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--num_samples", type=int, default=50_000)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--guidance_scale", type=float, default=16.0)
    ap.add_argument("--guidance_scale_pow", type=float, default=2.75)
    ap.add_argument("--temperature", type=float, default=1.02)
    ap.add_argument("--num_classes", type=int, default=1000)
    ap.add_argument("--output", default="samples.npz")
    ap.add_argument("--ref_npz", default=None,
                    help="reference batch npz: run the full evaluator "
                         "(FID/sFID/IS/Prec/Recall) after sampling")
    ap.add_argument("--inception_ckpt", default=None)
    from imagefolder_tpu.parallel.mesh import add_distributed_args, init_from_args

    add_distributed_args(ap)
    args = ap.parse_args()
    init_from_args(args)

    from imagefolder_tpu.models import build_maskgit, build_rar
    from imagefolder_tpu.models.rar import rar_generate
    from imagefolder_tpu.models.tokenizer import VQModel
    from imagefolder_tpu.utils.config import load_tokenizer_config
    from scripts.pretokenize import _load_params

    margs, _, _ = load_tokenizer_config(args.config)
    vae = VQModel(margs)
    vae_params = _load_params(args.vq_ckpt, vae, margs)

    seq_len = margs.num_latent_tokens * margs.product_quant
    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(Path(args.rar_ckpt).absolute())
    rar_params = restored.get("ema_params") or restored["params"]

    if args.model == "maskgit":
        from imagefolder_tpu.models.maskgit import maskgit_generate

        mg = build_maskgit(margs, hidden=args.hidden, depth=args.depth,
                           heads=args.heads, num_classes=args.num_classes,
                           dtype_str="bfloat16", arch=args.maskgit_arch)

        def gen(p, c, k):  # python decode loop; fwd passes jitted inside
            return maskgit_generate(
                mg, p, c, k, guidance_scale=args.guidance_scale,
                guidance_decay=args.guidance_decay,
                guidance_scale_pow=args.guidance_scale_pow,
                randomize_temperature=args.temperature,
                num_sample_steps=args.num_sample_steps)
    else:
        rar = build_rar(margs, hidden=args.hidden, depth=args.depth,
                        heads=args.heads, num_classes=args.num_classes,
                        dtype_str="bfloat16")
        # KV cache in the model's activation dtype: k/v are bf16-rounded
        # before caching anyway, so an fp32 cache only doubles its HBM
        # footprint/bandwidth (RAR-B B=64 CFG: 4.9 GB -> 2.4 GB)
        gen = jax.jit(lambda p, c, k: rar_generate(
            rar, p, c, k, guidance_scale=args.guidance_scale,
            randomize_temperature=args.temperature,
            guidance_scale_pow=args.guidance_scale_pow,
            cache_dtype=rar.config.dtype))
    dec = jax.jit(lambda p, t: vae.apply({"params": p}, t,
                                         method=VQModel.decode_tokens))

    # class-balanced label set (sample_imagenet_rar.py:94-101); under
    # multi-process each rank takes a strided slice (stays class-balanced)
    labels = np.tile(np.arange(args.num_classes),
                     -(-args.num_samples // args.num_classes))[:args.num_samples]
    labels = labels[jax.process_index()::jax.process_count()]
    out = []
    key = jax.random.fold_in(jax.random.PRNGKey(0), jax.process_index())
    for i in range(0, len(labels), args.batch_size):
        lb = jnp.asarray(labels[i:i + args.batch_size])
        if len(lb) < args.batch_size:
            lb = jnp.pad(lb, (0, args.batch_size - len(lb)))
        key, k = jax.random.split(key)
        toks = gen(rar_params, lb, k)
        imgs = dec(vae_params, toks)  # [-1,1]
        u8 = np.asarray(jnp.clip(127.5 * imgs + 128.0, 0, 255)).astype(np.uint8)
        out.append(u8[:min(args.batch_size, len(labels) - i)])
        if i % (args.batch_size * 50) == 0:
            print(f"{i}/{len(labels)}")
    arr = np.concatenate(out)
    if jax.process_count() > 1:
        # per-rank shard + rank-0 merge (reference writes per-rank PNG dirs
        # then merges, sample_imagenet_rar.py:120-145)
        from imagefolder_tpu.parallel.mesh import sync_global_devices

        np.savez(f"{args.output}.rank{jax.process_index()}", arr_0=arr)
        sync_global_devices("rar_samples")
        if jax.process_index() != 0:
            return
        arr = np.concatenate([
            np.load(f"{args.output}.rank{i}.npz")["arr_0"]
            for i in range(jax.process_count())])
    arr = arr[:args.num_samples]
    np.savez(args.output, arr_0=arr)
    print(f"wrote {args.output}: {arr.shape}")

    if args.ref_npz:
        # gFID leg (reference inference.py:117-133 -> evaluator.py main)
        from scripts.evaluate_fid import evaluate, load_inception

        feat_fn = load_inception(args.inception_ckpt)
        evaluate(args.ref_npz, args.output, feat_fn)


if __name__ == "__main__":
    main()
