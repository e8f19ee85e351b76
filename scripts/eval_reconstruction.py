"""Reconstruction evaluation CLI: PSNR/SSIM (reference
``tokenizer/vqgan/reconstruction_vqgan_ddp.py``) and rFID/pFID against val
images (reference ``xqgan_train.py:516-569``) when Inception weights are
given.

pFID = FID with RobustTok latent perturbation applied on the eval encode
path (--perturb alpha beta delta).
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
    ap.add_argument("--val_data", default=None)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--max_images", type=int, default=5000)
    ap.add_argument("--inception_ckpt", default=None,
                    help="pytorch-fid checkpoint for rFID")
    ap.add_argument("--perturb", nargs=3, type=float, default=None,
                    metavar=("ALPHA", "BETA", "DELTA"))
    args = ap.parse_args()

    from imagefolder_tpu.data.imagenet import make_dataloader
    from imagefolder_tpu.eval.fid import compute_statistics, frechet_distance
    from imagefolder_tpu.eval.psnr_ssim import psnr, ssim
    from imagefolder_tpu.models.tokenizer import VQModel
    from imagefolder_tpu.ops.perturb import add_perturbation
    from imagefolder_tpu.utils.config import load_tokenizer_config
    from scripts.pretokenize import _load_params

    # the canonical rFID protocol evaluates at fp32 (the reference's eval
    # leg runs outside the autocast block, xqgan_train.py:522-534)
    margs, _, run = load_tokenizer_config(args.config,
                                          {"dtype_str": "float32"})
    val = args.val_data or run.val_data_path
    model = VQModel(margs)
    params = _load_params(args.vq_ckpt, model, margs)

    if args.perturb is None:
        rec_fn = jax.jit(lambda p, x: model.apply(
            {"params": p}, x, method=VQModel.img_to_reconstructed_img))
    else:
        alpha, beta, delta = args.perturb

        def rec_perturbed(p, x, key):
            # encode -> quantize -> perturb (pFID eval path)
            h = model.apply({"params": p}, x, method=VQModel.encode)
            fhats = model.apply({"params": p}, x, method=VQModel._branch_fhats)
            quants = []
            for i in range(margs.product_quant):
                qname = (f"quantize_{i}" if margs.product_quant > 1
                         else "quantize")
                cb = p[qname]["codebook"]
                key_i = jax.random.fold_in(key, i)
                zq = add_perturbation(
                    h[:, i], fhats[i][-1], cb, alpha=alpha, beta=beta,
                    delta=int(delta), key=key_i,
                    codebook_norm=margs.codebook_l2_norm)
                quants.append(zq)
            quant = jnp.concatenate(quants, axis=-1)
            return jnp.clip(model.apply({"params": p}, quant,
                                        method=VQModel.fhat_to_img), -1, 1)

        rec_fn = jax.jit(rec_perturbed)

    inception = inception_vars = None
    if args.inception_ckpt:
        import torch

        from imagefolder_tpu.eval.inception import (
            InceptionV3,
            convert_inception_checkpoint,
        )

        inception = InceptionV3()
        sd = torch.load(args.inception_ckpt, map_location="cpu",
                        weights_only=False)
        inception_vars = convert_inception_checkpoint(sd)
        # params as jit args (a closed-over tree is baked into the HLO as
        # constants — a ~95 MB remote-compile request on the tunnel)
        _feat = jax.jit(lambda v, x01: inception.apply(v, x01))
        feat_fn = lambda x01: _feat(inception_vars, x01)

    loader = make_dataloader(val, args.batch_size, margs.image_size,
                             train=False, num_epochs=1, drop_remainder=False)
    psnrs, ssims = [], []
    feats_real, feats_fake = [], []
    seen = 0
    key = jax.random.PRNGKey(0)
    for b in loader:
        if seen >= args.max_images:
            break
        x = jnp.asarray(b["image"])
        if args.perturb is None:
            r = rec_fn(params, x)
        else:
            key, k = jax.random.split(key)
            r = rec_fn(params, x, k)
        x01, r01 = x * 0.5 + 0.5, r * 0.5 + 0.5
        psnrs.append(np.asarray(psnr(x01, r01)))
        ssims.append(np.asarray(ssim(x01, r01)))
        if inception is not None:
            feats_real.append(np.asarray(feat_fn(x01)["pool3"]))
            feats_fake.append(np.asarray(feat_fn(r01)["pool3"]))
        seen += x.shape[0]

    print(f"images: {seen}")
    print(f"PSNR: {np.mean(np.concatenate(psnrs)):.4f}")
    print(f"SSIM: {np.mean(np.concatenate(ssims)):.4f}")
    if inception is not None:
        s_real = compute_statistics(np.concatenate(feats_real))
        s_fake = compute_statistics(np.concatenate(feats_fake))
        tag = "pFID" if args.perturb else "rFID"
        print(f"{tag}: {s_real.frechet_distance(s_fake):.4f}")


if __name__ == "__main__":
    main()
