"""Sustained GAN training soak on the real chip (VERDICT r3 item #2).

Runs hundreds of flagship-assembly tokenizer GAN steps (DINOv2-ViT enc/dec,
PQ2, 10-scale MSVQ, DinoDisc + LPIPS + semantic guide, adaptive disc weight,
LeCam, DiffAug, latent-perturbation anneal) on procedural data, recording
per-step curves: loss components, per-scale codebook usage, disc/gen logits
balance, EMA drift. Kills at --kill_at (checkpoint) and a second invocation
resumes bit-exactly, re-verifying the overlap window before continuing —
the strongest convergence/correctness evidence available without ImageNet
(reference epoch-loop semantics: xqgan_train.py:428-513).

Phase A: python scripts/soak.py --phase a   (steps 0..kill_at+overlap,
         checkpoint at kill_at, then exits — the "kill")
Phase B: python scripts/soak.py --phase b   (restores kill_at, re-runs the
         overlap window, asserts metric continuity, continues to --steps,
         writes merged CSV + PNG curves)
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


METRIC_KEYS = [
    "gen_loss", "disc_loss", "rec_loss", "perceptual_loss", "gen_adv_loss",
    "vq_loss", "commit_loss", "entropy_loss", "sem_loss", "codebook_usage",
    "disc_weight", "disc_adaptive_weight", "logits_real", "logits_fake",
]


def make_pool(n=256, size=256, seed=0):
    """Procedural image pool in [-1, 1]: textured low-frequency content so
    rec/perceptual losses have structure to learn."""
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    pool = np.empty((n, size, size, 3), np.float32)
    for i in range(n):
        f1, f2 = 11 + (i % 17), 19 + (i % 29)
        base = (np.sin(xx / f1 + i) * np.cos(yy / f2) +
                0.5 * np.sin((xx + yy) / (7 + i % 5)))
        img = np.stack([base, np.roll(base, i % 31, 0),
                        np.roll(base, i % 23, 1)], -1)
        img += rng.normal(0, 0.15, img.shape)
        pool[i] = np.clip(img * 0.5, -1, 1)
    return pool


def batch_for_step(pool, step, batch):
    rng = np.random.default_rng(1000 + step)  # step-derived: resume-exact
    idx = rng.choice(len(pool), batch, replace=False)
    x = pool[idx]
    if rng.random() < 0.5:
        x = x[:, :, ::-1]
    return np.ascontiguousarray(x)


def build(args):
    import jax

    from imagefolder_tpu.models.tokenizer import ModelArgs
    from imagefolder_tpu.train.tokenizer_train import (
        TokenizerTrainConfig,
        TokenizerTrainer,
    )

    if args.image_size == 512:
        # 512px recipe (reference arg_util.py:287-291): 32x32 latent grid,
        # pn pyramid up to 32 -> ViT L=2049, the q-blocked kernel regime
        pns, n_latent = (1, 2, 3, 4, 6, 9, 13, 18, 24, 32), 1024
    else:
        pns, n_latent = (1, 1, 2, 3, 3, 4, 5, 6, 8, 11), 121
    quant_kw = dict(codebook_size=4096, codebook_embed_dim=32)
    if args.lfq:
        # MSBR10P2 recipe (configs/MSBR10P2-4096.yaml, reference
        # lookup_free_quantize.py:149-300): BSQ sign-bit codes (2^12 = 4096,
        # 12-dim), soft-entropy aux loss — exercises the LFQ training
        # dynamics end-to-end
        quant_kw = dict(lfq=True, codebook_size=4096, codebook_embed_dim=12,
                        codebook_l2_norm=True, soft_entropy=True,
                        entropy_loss_ratio=0.1, scale=1.0)
    enc_model = "vit_small_patch14_dinov2.lvd142m"
    if args.detail_guide != "none":
        # the shared quant_conv routes the 768-dim CLIP teacher features:
        # detail alignment requires a vit_base encoder (xqgan_model.py:344)
        enc_model = "vit_base_patch14_dinov2.lvd142m"
    margs = ModelArgs(
        v_patch_nums=pns,
        enc_type="dinov2", dec_type="dinov2",
        encoder_model=enc_model,
        decoder_model="vit_small_patch14_dinov2.lvd142m",
        semantic_guide="dinov2", detail_guide=args.detail_guide,
        num_latent_tokens=n_latent, product_quant=2,
        abs_pos_embed=True, codebook_drop=0.1, start_drop=3,
        image_size=args.image_size, dtype_str="bfloat16",
        **quant_kw,
    )
    steps_per_epoch = max(args.steps // args.epochs, 1)
    tcfg = TokenizerTrainConfig(
        disc_type="dinodisc", disc_start=args.disc_start,
        disc_adaptive_weight=True, lecam_loss_weight=0.001,
        epochs=args.epochs, steps_per_epoch=steps_per_epoch,
        image_size=args.image_size, ema=True,
        global_batch_size=args.batch)
    trainer = TokenizerTrainer(margs, tcfg)
    return trainer, steps_per_epoch


def anneal_for(step, steps_per_epoch, total_epochs):
    """RobustTok perturbation anneal: ratio ramps 0 -> 1 over the run
    (reference get_random_ratio, xqgan_train.py:62-68,429-432)."""
    epoch = step // steps_per_epoch
    ratio = min(epoch / max(total_epochs - 1, 1), 1.0)
    alpha, beta = 0.1 * ratio, 0.2
    return epoch, alpha, beta, ratio


def ema_drift_fn():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def drift(params, ema):
        num = 0.0
        den = 0.0
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(ema)):
            num += jnp.sum(jnp.square(a.astype(jnp.float32) -
                                      b.astype(jnp.float32)))
            den += a.size
        return jnp.sqrt(num / den)

    return drift


def run_steps(trainer, state, pool, start, stop, args, writer, key,
              steps_per_epoch, drift, ckpt=None, ckpt_at=None):
    import jax

    rows = []
    t_last = time.time()
    for step in range(start, stop):
        if ckpt is not None and step == ckpt_at:
            print(f"[soak] checkpoint at step {step} (tunnel transfer may "
                  "take minutes)", flush=True)
            t0 = time.time()
            ckpt.save(step, jax.device_get(state))
            ckpt.wait()
            print(f"[soak] checkpoint saved in {time.time() - t0:.0f}s",
                  flush=True)
        epoch, alpha, beta, ratio = anneal_for(step, steps_per_epoch,
                                               args.epochs)
        imgs = jax.numpy.asarray(batch_for_step(pool, step, args.batch))
        state, metrics = trainer.train_step(
            state, imgs, jax.random.fold_in(key, step), epoch=epoch,
            alpha=alpha, beta=beta, delta_ratio=ratio)
        got = {k: float(metrics[k]) for k in METRIC_KEYS if k in metrics}
        got["step"] = step
        if step % args.drift_every == 0 and state.ema_params is not None:
            got["ema_drift"] = float(drift(state.params, state.ema_params))
        now = time.time()
        got["step_ms"] = round((now - t_last) * 1e3, 1)
        t_last = now
        if writer is not None:
            writer.writerow(got)
        rows.append(got)
        if step % 25 == 0:
            print(f"[soak] step {step} gen={got.get('gen_loss'):.4f} "
                  f"disc={got.get('disc_loss'):.4f} "
                  f"usage={got.get('codebook_usage'):.2f}", flush=True)
    return state, rows


def plot_curves(out, rows, fname="curves.png"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    steps = [r["step"] for r in rows]

    def series(k):
        return [r.get(k, float("nan")) for r in rows]

    fig, axes = plt.subplots(2, 3, figsize=(16, 8))
    panels = [
        ("losses", ["gen_loss", "disc_loss"]),
        ("reconstruction", ["rec_loss", "perceptual_loss", "sem_loss"]),
        ("quantizer", ["vq_loss", "commit_loss"]),
        ("codebook usage %", ["codebook_usage"]),
        ("disc balance", ["logits_real", "logits_fake", "disc_weight"]),
        ("EMA drift", ["ema_drift"]),
    ]
    for ax, (title, keys) in zip(axes.ravel(), panels):
        for k in keys:
            ys = series(k)
            if all(np.isnan(y) for y in ys):
                continue
            if k == "ema_drift":
                pts = [(s_, y) for s_, y in zip(steps, ys)
                       if not np.isnan(y)]
                if pts:
                    ax.plot(*zip(*pts), label=k, marker=".")
            else:
                ax.plot(steps, ys, label=k)
        ax.set_title(title)
        ax.legend(fontsize=7)
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out / fname, dpi=110)
    print(f"[soak] wrote {out / fname}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["a", "b"], required=True)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--kill_at", type=int, default=250)
    ap.add_argument("--overlap", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--disc_start", type=int, default=50)
    ap.add_argument("--drift_every", type=int, default=25)
    ap.add_argument("--out", default="soak")
    ap.add_argument("--tol", type=float, default=0.0,
                    help="max |diff| allowed in the resume overlap window")
    ap.add_argument("--lfq", action="store_true",
                    help="MSBR10P2-style BSQ quantizer (soft-entropy loss)")
    ap.add_argument("--detail_guide", default="none",
                    help="enable the CLIP detail-alignment leg (forces a "
                         "vit_base encoder)")
    args = ap.parse_args()

    import jax

    from imagefolder_tpu.utils.ckpt import CheckpointManager

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    trainer, steps_per_epoch = build(args)
    pool = make_pool(size=args.image_size)
    key = jax.random.PRNGKey(0)
    drift = ema_drift_fn()
    ckpt = CheckpointManager(str(out / "ckpt"))

    fieldnames = ["step"] + METRIC_KEYS + ["ema_drift", "step_ms"]

    if args.phase == "a":
        print("[soak] phase A: init + compile", flush=True)
        t0 = time.time()
        # jit the init: eager flax init over the axon tunnel is an RPC per op
        state = jax.jit(trainer.init)(key, jax.numpy.asarray(pool[:2]))
        print(f"[soak] init done in {time.time() - t0:.0f}s", flush=True)
        with open(out / "metrics_a.csv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=fieldnames,
                               extrasaction="ignore")
            w.writeheader()
            state, rows = run_steps(
                trainer, state, pool, 0, args.kill_at + args.overlap, args,
                w, key, steps_per_epoch, drift, ckpt=ckpt,
                ckpt_at=args.kill_at)
        print(f"[soak] phase A done in {time.time() - t0:.0f}s — process "
              "exits here (the 'kill'); run phase b to resume", flush=True)
        return 0

    # ---- phase B: restore at kill_at, verify overlap, continue ----
    print("[soak] phase B: restoring checkpoint", flush=True)
    template = jax.eval_shape(trainer.init, key,
                              jax.numpy.asarray(pool[:2]))
    template = jax.tree.map(
        lambda sd: np.zeros(sd.shape, sd.dtype), template)
    restored, step0 = ckpt.restore(template)
    assert restored is not None, "no checkpoint to resume from (run phase a)"
    assert step0 == args.kill_at, (step0, args.kill_at)
    state = jax.tree.map(jax.numpy.asarray, restored)

    prev = list(csv.DictReader(open(out / "metrics_a.csv")))
    overlap_ref = [r for r in prev
                   if args.kill_at <= int(r["step"]) <
                   args.kill_at + args.overlap]

    with open(out / "metrics_b.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fieldnames, extrasaction="ignore")
        w.writeheader()
        state, rows = run_steps(
            trainer, state, pool, args.kill_at,
            args.kill_at + args.overlap, args, w, key, steps_per_epoch,
            drift)
        # ---- bit-exact resume check over the overlap window ----
        worst = 0.0
        for ref, got in zip(overlap_ref, rows):
            for k in METRIC_KEYS:
                if k in got and ref.get(k):
                    worst = max(worst, abs(float(ref[k]) - got[k]))
        print(f"[soak] resume overlap max |metric diff| = {worst:.3e} "
              f"over steps {args.kill_at}..{args.kill_at + args.overlap - 1}",
              flush=True)
        assert worst <= args.tol, (
            f"resume NOT exact: {worst} > tol {args.tol}")
        state, rows2 = run_steps(
            trainer, state, pool, args.kill_at + args.overlap, args.steps,
            args, w, key, steps_per_epoch, drift)
        rows += rows2

    def normalize(r):
        o = {}
        for k in fieldnames:
            v = r.get(k)
            try:
                o[k] = float(v)
            except (TypeError, ValueError):
                o[k] = float("nan")
        return o

    merged = [normalize(r) for r in prev if int(r["step"]) < args.kill_at]
    merged += [normalize(r) for r in rows]
    plot_curves(out, merged)
    summary = {
        "steps": args.steps,
        "kill_at": args.kill_at,
        "resume_overlap_max_diff": worst,
        "final": {k: merged[-1].get(k) for k in METRIC_KEYS
                  if merged[-1].get(k) == merged[-1].get(k)},
    }
    (out / "summary.json").write_text(json.dumps(summary, indent=1))
    print("[soak] OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
