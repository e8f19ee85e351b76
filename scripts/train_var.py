"""VAR generator training CLI (reference ``train.py``): frozen tokenizer +
VAR teacher-forced CE over the multi-scale pyramid.

In-training evaluation (reference parity): every ``--eval_every`` steps
(default = 10 epochs, ``train.py:230``) runs ``eval_ep`` over the val split
(val CE/acc mean+tail, ``trainer.py:58-101``), renders an 8-class CFG
preview grid (``trainer.py:85-93``: cfg=5, top_k=900, top_p=0.95), and keeps
a best-by-val-loss-tail checkpoint (``train.py:249-261``).

Usage:
    python scripts/train_var.py --config configs/MSVR10P2-4096.yaml \
        --vq_ckpt <tokenizer ckpt> --depth 17 [key=value ...]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--vq_ckpt", required=True)
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--tblr", type=float, default=1e-4,
                    help="base lr per 256 batch (reference arg_util tblr)")
    ap.add_argument("--pg", type=float, default=0.0,
                    help="progressive training over [0%%, pg] of the run "
                         "(reference arg_util pg; also forces sche=lin{pg})")
    ap.add_argument("--pg0", type=int, default=4,
                    help="initial progressive stage (reference pg0)")
    ap.add_argument("--pgwp", type=float, default=0.0,
                    help="warmup epochs per progressive stage (reference "
                         "pgwp; 0 -> epochs/300)")
    ap.add_argument("--num_classes", type=int, default=1000)
    ap.add_argument("--output", default="output/var")
    ap.add_argument("--log_every", type=int, default=100)
    ap.add_argument("--ckpt_every", type=int, default=5000)
    ap.add_argument("--val_data_path", default=None,
                    help="val split (defaults to the config's val_data_path)")
    ap.add_argument("--eval_every", type=int, default=0,
                    help="steps between eval_ep + preview + best-ckpt "
                         "(0 -> every 10 epochs, reference train.py:230)")
    ap.add_argument("--val_batches", type=int, default=0,
                    help="cap eval_ep batches (0 = full val split)")
    ap.add_argument("--wandb", action="store_true")
    from imagefolder_tpu.parallel.mesh import add_distributed_args, init_from_args

    add_distributed_args(ap)
    args = ap.parse_args()
    init_from_args(args)

    from imagefolder_tpu.data.imagenet import (
        device_prefetch,
        list_image_folder,
        make_dataloader,
    )
    from imagefolder_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from imagefolder_tpu.eval.validation import var_eval_ep
    from imagefolder_tpu.train.var_train import (
        ProgressiveController,
        VARTrainConfig,
        VARTrainer,
        build_vae_var,
        var_sample,
    )
    from imagefolder_tpu.utils.ckpt import CheckpointManager
    from imagefolder_tpu.utils.config import load_tokenizer_config
    from imagefolder_tpu.utils.logging import MetricLogger, Tracker, create_logger
    from imagefolder_tpu.utils.viz import generation_grid, save_png
    from scripts.pretokenize import _load_params

    logger = create_logger(args.output)
    margs, _, run = load_tokenizer_config(args.config)
    vae, var = build_vae_var(margs, depth=args.depth,
                             num_classes=args.num_classes,
                             dtype_str="bfloat16")
    vae_params = _load_params(args.vq_ckpt, vae, margs)

    n_train = len(list_image_folder(run.data_path)[0])
    steps_per_epoch = max(n_train // args.batch_size, 1)
    total = args.epochs * steps_per_epoch
    # pg > 0 forces the lr schedule to lin{pg} (arg_util.py:311-312)
    sched = f"lin{args.pg:g}" if args.pg > 0 else VARTrainConfig.sched
    tcfg = VARTrainConfig(
        lr=args.tblr * args.batch_size / 256.0, sched=sched,
        warmup_steps=steps_per_epoch, total_steps=total)
    trainer = VARTrainer(vae, var, tcfg)
    pgwp = args.pgwp or args.epochs / 300.0  # arg_util.py:309-310
    prog = ProgressiveController(len(margs.v_patch_nums), pg=args.pg,
                                 pg0=args.pg0,
                                 prog_wp_it=pgwp * steps_per_epoch)

    key = jax.random.PRNGKey(run.seed)
    sample = jnp.zeros((2, margs.image_size, margs.image_size, 3))
    state = trainer.init(key, vae_params, sample)
    mesh = make_mesh(("data",))
    state = replicate(state, mesh)
    ckpt = CheckpointManager(args.output)
    restored, start = ckpt.restore(state)
    if restored is not None:
        state = restored
        logger.info(f"resumed at step {start}")
        aux = ckpt.restore_aux(start)
        if aux and "prog" in aux:
            # mid-stage warmup counters survive the restart (reference
            # keeps prog_it/last_prog_si in trainer.state_dict)
            prog.load_state_dict(aux["prog"])
            logger.info("restored progressive-training state")

    assert args.batch_size % jax.process_count() == 0
    loader = make_dataloader(run.data_path,
                             args.batch_size // jax.process_count(),
                             margs.image_size, train=True, seed=run.seed,
                             shard_index=jax.process_index(),
                             shard_count=jax.process_count())
    mlog = MetricLogger(logger, args.log_every)
    tracker = Tracker(use_wandb=args.wandb, log_dir=args.output, use_tb=True)
    val_path = (args.val_data_path if args.val_data_path is not None
                else run.val_data_path)
    eval_every = args.eval_every or 10 * steps_per_epoch
    val_bs = min(args.batch_size // jax.process_count(), 32)
    # jitted once, reused every eval (trainer.py:85-93 preview protocol)
    preview_fn = jax.jit(lambda p, vp, lb, k: var_sample(
        var, p, vae, vp, lb, k, cfg_scale=5.0, top_k=900, top_p=0.95))

    def run_eval(state, step):
        """eval_ep + CFG preview + best-by-val-loss-tail (train.py:230-261)."""
        import numpy as np

        params, vparams = state.params, state.vae_params
        if jax.process_count() > 1:  # per-host local copy for the eval loop
            params, vparams = jax.device_get((params, vparams))
        vloader = make_dataloader(val_path, val_bs, margs.image_size,
                                  train=False, num_epochs=1,
                                  drop_remainder=jax.process_count() > 1,
                                  shard_index=jax.process_index(),
                                  shard_count=jax.process_count())
        ev = var_eval_ep(
            lambda x, y: trainer.eval_step(params, vparams, x, y),
            vloader, val_bs, args.val_batches or None)
        logger.info(
            f"[eval step {step}] (val {ev['val_tot']}) "
            f"Lm: {ev['val_L_mean']:.4f}, Lt: {ev['val_L_tail']:.4f}, "
            f"Acc m&t: {ev['val_acc_mean']:.2f} {ev['val_acc_tail']:.2f}")
        tracker.log({k: v for k, v in ev.items() if k != "val_tot"}, step)
        if jax.process_index() == 0:
            lbls = jnp.asarray(np.random.default_rng(0).choice(
                args.num_classes, 8).astype(np.int32))
            imgs01 = preview_fn(params, vparams, lbls, jax.random.PRNGKey(0))
            grid = generation_grid(np.asarray(imgs01) * 2.0 - 1.0, ncol=8)
            save_png(grid, Path(args.output) / "preview"
                     / f"gen_{step:07d}.png")
            tracker.log_image("generated_images", grid, step)
        ckpt.save_best(jax.device_get(state), ev["val_L_tail"])
        return ev

    raw = iter(loader)
    if start and ckpt.apply_data_state(start, raw, log=logger.info):
        logger.info("restored data-stream state")
    it = device_prefetch(raw)
    for step in range(start, total):
        try:
            b = next(it)
        except StopIteration:
            it = device_prefetch(iter(loader))
            b = next(it)
        batch = shard_batch({"x": jnp.asarray(b["image"]),
                             "y": jnp.asarray(b["label"])}, mesh)
        prog_si, prog_wp = prog.step(
            prog.stage(step, tcfg.warmup_steps, total))
        state, metrics = trainer.train_step(state, batch["x"], batch["y"],
                                            jax.random.fold_in(key, step),
                                            prog_si=prog_si, prog_wp=prog_wp)
        if (step + 1) % args.log_every == 0:
            host = {k: float(v) for k, v in metrics.items()}
            mlog.update(**host)
            mlog.log(step + 1, total)
            tracker.log(host, step + 1)
        if (step + 1) % args.ckpt_every == 0:
            ckpt.save(step + 1, jax.device_get(state))
            ckpt.save_data_state(step + 1, it.state)
            ckpt.save_aux(step + 1, {"prog": prog.state_dict()})
        if val_path and (step + 1) % eval_every == 0:
            run_eval(state, step + 1)
    ckpt.save(total, jax.device_get(state))
    # final-epoch eval (reference `or (ep+1) == args.ep`, train.py:230)
    if val_path and total > start and total % eval_every != 0:
        run_eval(state, total)
    ckpt.wait()


if __name__ == "__main__":
    main()
