"""Tokenizer (XQ-GAN) training CLI — reference
``tokenizer/tokenizer_image/xqgan_train.py``.

Usage:
    python scripts/train_tokenizer.py --config configs/VQ-4096.yaml \
        [key=value overrides ...]

One YAML schema (identical keys to the reference configs/), one jitted
GAN step, grain data loading, orbax checkpoints with best-by-val-metric,
RobustTok perturbation annealing, optional val rFID when Inception weights
are supplied (--inception_ckpt, a pytorch-fid checkpoint).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from imagefolder_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import jax
import jax.numpy as jnp
import numpy as np


def get_random_ratio(anneal_start, anneal_end, end_ratio, epoch):
    """RobustTok annealing (xqgan_train.py:62-68)."""
    if epoch < anneal_start or anneal_end <= anneal_start:
        return 1.0
    if epoch > anneal_end:
        return end_ratio
    return 1.0 - (epoch - anneal_start) / (anneal_end - anneal_start) * end_ratio


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, required=True)
    ap.add_argument("--inception_ckpt", type=str, default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--wandb", action="store_true")
    ap.add_argument("--profile_steps", type=int, default=0,
                    help="capture a jax.profiler trace for N early steps")
    ap.add_argument("overrides", nargs="*")
    from imagefolder_tpu.parallel.mesh import add_distributed_args, init_from_args

    add_distributed_args(ap)
    args = ap.parse_args()
    init_from_args(args)

    from imagefolder_tpu.data.imagenet import device_prefetch, make_dataloader
    from imagefolder_tpu.eval.psnr_ssim import psnr, ssim
    from imagefolder_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from imagefolder_tpu.train.tokenizer_train import TokenizerTrainer
    from imagefolder_tpu.utils.ckpt import CheckpointManager
    from imagefolder_tpu.utils.config import load_tokenizer_config, parse_overrides
    from imagefolder_tpu.utils.logging import MetricLogger, Tracker, create_logger

    margs, tcfg, run = load_tokenizer_config(args.config,
                                             parse_overrides(args.overrides))
    logger = create_logger(run.cloud_save_path)
    logger.info(f"model: {margs}")
    logger.info(f"train: {tcfg}")

    mesh = make_mesh(("data",))
    n_dev = mesh.shape["data"]
    batch = run.global_batch_size
    assert batch % n_dev == 0

    assert batch % jax.process_count() == 0
    loader = make_dataloader(run.data_path, batch // jax.process_count(),
                             margs.image_size,
                             train=True, seed=run.seed,
                             shard_index=jax.process_index(),
                             shard_count=jax.process_count())
    # steps/epoch for schedules
    from imagefolder_tpu.data.imagenet import list_image_folder
    n_train = len(list_image_folder(run.data_path)[0])
    tcfg.steps_per_epoch = max(n_train // batch, 1)
    tcfg.disc_start = run.disc_epoch_start * tcfg.steps_per_epoch
    tcfg.epochs = run.epochs

    trainer = TokenizerTrainer(margs, tcfg)
    key = jax.random.PRNGKey(run.seed)
    sample = jnp.zeros((2, margs.image_size, margs.image_size, 3))
    state = trainer.init(key, sample)
    state = replicate(state, mesh)

    ckpt = CheckpointManager(run.cloud_save_path)
    start_step = 0
    if args.resume:
        restored, start_step = ckpt.restore(state)
        if restored is not None:
            state = restored
            logger.info(f"resumed from step {start_step}")

    tracker = Tracker(use_wandb=args.wandb, log_dir=run.cloud_save_path,
                      use_tb=True)
    mlog = MetricLogger(logger, run.log_every)
    total_steps = tcfg.epochs * tcfg.steps_per_epoch

    step = start_step
    data_raw = iter(loader)
    if start_step and ckpt.apply_data_state(start_step, data_raw,
                                            log=logger.info):
        logger.info("restored data-stream state (exact batch-order resume)")
    data_it = device_prefetch(data_raw)
    t0 = time.time()
    for epoch in range(start_step // tcfg.steps_per_epoch, run.epochs):
        ratio = get_random_ratio(run.anneal_start, run.anneal_end,
                                 run.end_ratio, epoch)
        alpha = run.alpha * ratio
        if run.disc_reinit and epoch and epoch % run.disc_reinit == 0:
            state = trainer.reinit_disc_heads(
                state, jax.random.fold_in(key, 10_000_000 + epoch), sample)
            logger.info(f"discriminator heads re-initialized at epoch {epoch}")
        for _ in range(tcfg.steps_per_epoch):
            try:
                b = next(data_it)
            except StopIteration:
                data_it = device_prefetch(iter(loader))
                b = next(data_it)
            imgs = shard_batch(jnp.asarray(b["image"]), mesh)
            if run.aug_fade_steps >= 0:
                fade = 0 if step < tcfg.disc_start else min(
                    1.0, (step - tcfg.disc_start) / (run.aug_fade_steps + 1))
                fade = round(1 - fade, 3)
            else:
                fade = 0.0
            if args.profile_steps and step == 2:
                jax.profiler.start_trace(f"{run.cloud_save_path}/profile")
            state, metrics = trainer.train_step(
                state, imgs, jax.random.fold_in(key, step), epoch=epoch,
                alpha=alpha, beta=run.beta, delta_ratio=ratio, fade_blur=fade)
            if args.profile_steps and step == 2 + args.profile_steps:
                jax.tree.map(lambda a: a.block_until_ready(), metrics)
                jax.profiler.stop_trace()
            step += 1
            if step % run.log_every == 0:
                host = {k: float(v) for k, v in metrics.items()}
                mlog.update(**host)
                mlog.log(step, total_steps)
                tracker.log(host, step)
            if step % run.ckpt_every == 0:
                ckpt.save(step, jax.device_get(state))
                ckpt.save_data_state(step, data_it.state)
                if run.save_best and run.val_data_path:
                    m = validate(trainer, state, run, margs, logger)
                    ckpt.save_best(jax.device_get(state), m)
    ckpt.save(step, jax.device_get(state))
    ckpt.wait()
    logger.info(f"done in {(time.time() - t0) / 3600:.2f}h, {step} steps")


def validate(trainer, state, run, margs, logger, max_batches: int = 20):
    """Val PSNR/SSIM loop (rFID needs Inception weights; PSNR is the default
    best-ckpt metric here — lower objective uses -psnr)."""
    from imagefolder_tpu.data.imagenet import make_dataloader
    from imagefolder_tpu.eval.psnr_ssim import psnr
    from imagefolder_tpu.models.tokenizer import VQModel

    loader = make_dataloader(run.val_data_path, 8, margs.image_size,
                             train=False, num_epochs=1, drop_remainder=False)
    rec_fn = jax.jit(lambda v, x: trainer.model.apply(
        {"params": v}, x, method=VQModel.img_to_reconstructed_img))
    # host-local copy: under multi-process the train state lives on the
    # global mesh; val runs per-host on the local device
    params = jax.device_get(state.ema_params if state.ema_params is not None
                            else state.params)
    vals = []
    for i, b in enumerate(loader):
        if i >= max_batches:
            break
        x = jnp.asarray(b["image"])
        r = rec_fn(params, x)
        vals.append(np.asarray(psnr(x * 0.5 + 0.5, r * 0.5 + 0.5)))
    m = float(np.mean(np.concatenate(vals))) if vals else 0.0
    logger.info(f"val PSNR: {m:.3f}")
    return -m  # CheckpointManager treats lower as better


if __name__ == "__main__":
    main()
