"""Canonical benchmark/probe recipes.

``bench.py``'s train leg and ``scripts/perf.py gan``'s component-split probe
must measure the SAME flagship configuration for the split to explain the
bench number — both build it here instead of carrying private copies.

Flagship recipe = the VQ-4096-class tokenizer under full GAN training
(reference ``configs/VQ-4096.yaml`` + ``xqgan_train.py`` defaults): DINOv2
ViT-B encoder/decoder, PQ2, 10-scale MSVQ pyramid, DinoDisc + LPIPS + frozen
DINOv2 semantic teacher, adaptive disc weight, LeCam, both optimizers in one
jitted step; B=32 + activation remat is the recommended v5e recipe from the
PARITY batch-scaling study.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

__all__ = ["flagship_gan_recipe", "chained_gan_step_fns"]


def flagship_gan_recipe(batch: int, *, remat: bool = True,
                        margs_overrides: Optional[dict] = None,
                        tcfg_overrides: Optional[dict] = None):
    """(ModelArgs, TokenizerTrainConfig) for the flagship GAN train step.

    ``*_overrides`` let the perf probe statically remove one leg at a time
    (e.g. ``{"disc_weight": 0.0}``) without forking the base recipe."""
    from imagefolder_tpu.models.tokenizer import ModelArgs
    from imagefolder_tpu.train.tokenizer_train import TokenizerTrainConfig

    mkw = dict(
        codebook_size=4096, codebook_embed_dim=32,
        v_patch_nums=(1, 1, 2, 3, 3, 4, 5, 6, 8, 11),
        enc_type="dinov2", dec_type="dinov2",
        encoder_model="vit_base_patch14_dinov2.lvd142m",
        decoder_model="vit_base_patch14_dinov2.lvd142m",
        semantic_guide="dinov2", detail_guide="none",
        num_latent_tokens=121, product_quant=2, abs_pos_embed=True,
        codebook_drop=0.1, start_drop=3, image_size=256,
        dtype_str="bfloat16", remat=remat)
    mkw.update(margs_overrides or {})
    tkw = dict(
        disc_type="dinodisc", disc_start=0, disc_adaptive_weight=True,
        lecam_loss_weight=0.001, epochs=1, steps_per_epoch=1000,
        image_size=256, ema=True, global_batch_size=batch)
    tkw.update(tcfg_overrides or {})
    return ModelArgs(**mkw), TokenizerTrainConfig(**tkw)


def chained_gan_step_fns(trainer, key, iters: int) -> Tuple:
    """(short, long) jitted chains of 1 and 1+iters donated train steps.

    Chained-``fori_loop`` timing methodology (see bench.py module docstring):
    the tunneled backend does not block in ``block_until_ready``, so each
    chain threads the state through N steps and returns a scalar whose
    readback forces completion; per-step time is (long - short) / iters."""
    import jax
    import jax.numpy as jnp

    def chained(n):
        @partial(jax.jit, donate_argnums=(0,))
        def fn(st, xx):
            def body(i, s):
                s2, _ = trainer.train_step(
                    s, xx, jax.random.fold_in(key, i), epoch=0)
                return s2

            out = jax.lax.fori_loop(0, n, body, st)
            leaf = jax.tree.leaves(out.params)[0]
            return out, jnp.sum(leaf.astype(jnp.float32).ravel()[:1])

        return fn

    return chained(1), chained(1 + iters)
