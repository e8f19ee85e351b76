"""Tokenizer (XQ-GAN) training CLI — reference
``tokenizer/tokenizer_image/xqgan_train.py``.

Usage:
    python scripts/train_tokenizer.py --config configs/VQ-4096.yaml \
        [key=value overrides ...]

One YAML schema (identical keys to the reference configs/), one jitted
GAN step, grain data loading, orbax checkpoints with best-by-val-metric,
RobustTok perturbation annealing.

In-training evaluation (reference parity):
* with ``--inception_ckpt`` (a pytorch-fid checkpoint): full-val-split rFID
  with the uint8 clamp protocol every ``ckpt_every`` and best-checkpoint by
  rFID (``xqgan_train.py:516-569``, clamp at ``:524-557``);
* without weights: a full-val PSNR proxy gates best-ckpt instead (the
  reference simply cannot save_best without its TF graph asset);
* per-scale recon grids every ``vis_every`` steps to wandb/TB + PNG
  (``xqgan_train.py:504-513``), per-scale codebook-usage%% scalars.
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
    ap.add_argument("--val_batch_size", type=int, default=32,
                    help="per-host val batch for the rFID/PSNR loop")
    ap.add_argument("--val_batches", type=int, default=0,
                    help="cap val batches (0 = full val split, the "
                         "reference protocol)")
    ap.add_argument("overrides", nargs="*")
    from imagefolder_tpu.parallel.mesh import add_distributed_args, init_from_args

    add_distributed_args(ap)
    args = ap.parse_args()
    init_from_args(args)

    from imagefolder_tpu.data.imagenet import device_prefetch, make_dataloader
    from imagefolder_tpu.models.tokenizer import VQModel
    from imagefolder_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from imagefolder_tpu.train.tokenizer_train import TokenizerTrainer
    from imagefolder_tpu.utils.ckpt import CheckpointManager
    from imagefolder_tpu.utils.config import load_tokenizer_config, parse_overrides
    from imagefolder_tpu.utils.logging import (
        MetricLogger,
        Tracker,
        create_logger,
        flatten_metrics,
    )
    from imagefolder_tpu.utils.viz import save_png, scale_recon_grid

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

    # jitted once and reused by every validation/vis call (a fresh jit
    # wrapper per call would recompile each time over the remote backend)
    rec_fn = jax.jit(lambda p, x: trainer.model.apply(
        {"params": p}, x, method=VQModel.img_to_reconstructed_img))
    vis_fn = jax.jit(lambda p, x: trainer.model.apply(
        {"params": p}, x, last_one=False,
        method=VQModel.img_to_reconstructed_img))
    feat_fn = None
    if args.inception_ckpt:
        from scripts.evaluate_fid import load_inception

        feat_fn = load_inception(args.inception_ckpt)
        logger.info(f"val rFID enabled (Inception: {args.inception_ckpt})")

    step = start_step
    val_gt_cache = {}  # GT Inception stats computed once per run
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
                host = flatten_metrics(metrics)
                mlog.update(**{k: v for k, v in host.items() if "/" not in k})
                mlog.log(step, total_steps)
                tracker.log(host, step)
            if run.vis_every and step % run.vis_every == 0 and \
                    jax.process_index() == 0:
                # per-scale recon grid (xqgan_train.py:504-513)
                x4 = np.asarray(b["image"][:4])
                recons = vis_fn(_host_params(state), x4)
                grid = scale_recon_grid(x4, [np.asarray(r) for r in recons])
                save_png(grid, Path(run.cloud_save_path) / "vis"
                         / f"recon_{step:07d}.png")
                tracker.log_image("recon_images", grid, step)
            if step % run.ckpt_every == 0:
                ckpt.save(step, jax.device_get(state))
                ckpt.save_data_state(step, data_it.state)
                if run.save_best and run.val_data_path:
                    name, value, objective = validate(
                        trainer, state, run, margs, logger, rec_fn, feat_fn,
                        val_batch=args.val_batch_size,
                        max_batches=args.val_batches or None,
                        gt_cache=val_gt_cache)
                    tracker.log({name: value}, step)
                    ckpt.save_best(jax.device_get(state), objective)
    ckpt.save(step, jax.device_get(state))
    ckpt.wait()
    logger.info(f"done in {(time.time() - t0) / 3600:.2f}h, {step} steps")


def _host_params(state):
    """The live (non-EMA) model params, matching the reference's val/vis use
    of ``vq_model.module`` (xqgan_train.py:506,526). Under multi-process the
    train state lives on the global mesh; eval runs per-host on a local copy."""
    if jax.process_count() > 1:
        return jax.device_get(state.params)
    return state.params


def validate(trainer, state, run, margs, logger, rec_fn, feat_fn=None,
             val_batch: int = 32, max_batches=None, gt_cache=None):
    """Full-val rFID (xqgan_train.py:516-567, uint8 clamp protocol) when
    Inception weights are loaded; full-val PSNR proxy otherwise. Returns
    (metric_name, value, objective) — lower objective is better.

    ``gt_cache``: persistent dict so the ground-truth Inception statistics
    are computed once per run (the val split never changes mid-run)."""
    from imagefolder_tpu.data.imagenet import make_dataloader
    from imagefolder_tpu.eval.validation import (
        tokenizer_val_psnr,
        tokenizer_val_rfid,
    )

    # multi-process: equal per-host shard sizes (drop_remainder) keep the
    # activation allgather rectangular; single-host evaluates every image
    loader = make_dataloader(run.val_data_path, val_batch, margs.image_size,
                             train=False, num_epochs=1,
                             drop_remainder=jax.process_count() > 1,
                             shard_index=jax.process_index(),
                             shard_count=jax.process_count())
    params = _host_params(state)
    if feat_fn is not None:
        fid = tokenizer_val_rfid(rec_fn, params, loader, feat_fn, val_batch,
                                 max_batches, log=logger.info,
                                 gt_cache=gt_cache)
        logger.info(f"val rFID: {fid:.4f}")
        return "val_rfid", fid, fid
    m = tokenizer_val_psnr(rec_fn, params, loader, val_batch, max_batches)
    logger.info(f"val PSNR: {m:.3f} (no --inception_ckpt: PSNR proxy "
                "gates best-ckpt)")
    return "val_psnr", m, -m


if __name__ == "__main__":
    main()
