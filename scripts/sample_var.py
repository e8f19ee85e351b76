"""VAR inference / FID sampling CLI (reference ``inference.py``): CFG
multiscale decode over class-balanced labels -> uint8 npz; sweeps
cfg/top-k/top-p like the reference.
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
    ap.add_argument("--config", required=True)
    ap.add_argument("--vq_ckpt", required=True)
    ap.add_argument("--var_ckpt", required=True)
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--num_samples", type=int, default=50_000)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--cfg", type=float, default=3.25)
    ap.add_argument("--top_k", type=int, default=900)
    ap.add_argument("--top_p", type=float, default=0.96)
    ap.add_argument("--joint_sample", action="store_true")
    ap.add_argument("--more_smooth", action="store_true",
                    help="gumbel-softmax smoothed code mixtures "
                         "(var.py:196-225, inference.py:32 visualization "
                         "protocol; not for FID benchmarking)")
    ap.add_argument("--num_classes", type=int, default=1000)
    ap.add_argument("--output", default="var_samples.npz")
    ap.add_argument("--ref_npz", default=None,
                    help="reference batch npz: run the full evaluator "
                         "(FID/sFID/IS/Prec/Recall) after sampling")
    ap.add_argument("--inception_ckpt", default=None)
    from imagefolder_tpu.parallel.mesh import add_distributed_args, init_from_args

    add_distributed_args(ap)
    args = ap.parse_args()
    init_from_args(args)

    from imagefolder_tpu.train.var_train import build_vae_var, var_sample
    from imagefolder_tpu.utils.config import load_tokenizer_config
    from scripts.pretokenize import _load_params

    margs, _, _ = load_tokenizer_config(args.config)
    vae, var = build_vae_var(margs, depth=args.depth,
                             num_classes=args.num_classes,
                             dtype_str="bfloat16")
    vae_params = _load_params(args.vq_ckpt, vae, margs)

    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(Path(args.var_ckpt).absolute())
    var_params = restored.get("ema_params") or restored["params"]

    # vae_params passed as an argument (closing over them bakes the weights
    # into the HLO as constants — enormous graphs)
    sample_fn = jax.jit(lambda vp, vaep, lb, k: var_sample(
        var, vp, vae, vaep, lb, k, cfg_scale=args.cfg,
        top_k=args.top_k, top_p=args.top_p, joint_sample=args.joint_sample,
        more_smooth=args.more_smooth))

    labels = np.tile(np.arange(args.num_classes),
                     -(-args.num_samples // args.num_classes))[:args.num_samples]
    labels = labels[jax.process_index()::jax.process_count()]
    key = jax.random.fold_in(jax.random.PRNGKey(0), jax.process_index())
    out = []
    for i in range(0, len(labels), args.batch_size):
        lb = jnp.asarray(labels[i:i + args.batch_size])
        if len(lb) < args.batch_size:
            lb = jnp.pad(lb, (0, args.batch_size - len(lb)))
        key, k = jax.random.split(key)
        imgs = sample_fn(var_params, vae_params, lb, k)  # [0,1]
        u8 = np.asarray(jnp.clip(imgs * 255.0 + 0.5, 0, 255)).astype(np.uint8)
        out.append(u8[:min(args.batch_size, len(labels) - i)])
    arr = np.concatenate(out)
    if jax.process_count() > 1:
        from imagefolder_tpu.parallel.mesh import sync_global_devices

        np.savez(f"{args.output}.rank{jax.process_index()}", arr_0=arr)
        sync_global_devices("var_samples")
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
