"""Shorter VAR / RAR training soaks (VERDICT r3 item #2, second half).

Runs a few hundred real generator train steps on the chip with a frozen
flagship tokenizer (VAR) / a fixed synthetic token pool (RAR), recording
loss/accuracy/grad-norm curves. Convergence here means the teacher-forced
CE drops as the model memorizes the pool — evidence the full training
dynamics (optimizer, schedules, EMA, permutation training) behave over
hundreds of steps, not just the 3-step tests. Kill/resume bit-exactness is
separately proven by the GAN soak + integration tests (same orbax path).

Usage: python scripts/soak_generators.py --workload var --steps 150
       python scripts/soak_generators.py --workload rar --steps 150
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


def soak_var(args, out: Path):
    import jax
    import jax.numpy as jnp

    from imagefolder_tpu.models.tokenizer import ModelArgs
    from imagefolder_tpu.train.var_train import (
        VARTrainConfig,
        VARTrainer,
        build_vae_var,
    )
    from scripts.soak import make_pool

    margs = ModelArgs(
        codebook_size=4096, codebook_embed_dim=32,
        v_patch_nums=(1, 1, 2, 3, 3, 4, 5, 6, 8, 11),
        enc_type="dinov2", dec_type="dinov2",
        encoder_model="vit_small_patch14_dinov2.lvd142m",
        decoder_model="vit_small_patch14_dinov2.lvd142m",
        semantic_guide="none", detail_guide="none",
        num_latent_tokens=121, product_quant=2, abs_pos_embed=True,
        image_size=256, dtype_str="bfloat16")
    vae, var = build_vae_var(margs, depth=16, dtype_str="bfloat16")
    tcfg = VARTrainConfig(total_steps=args.steps,
                          warmup_steps=max(args.steps // 10, 1))
    trainer = VARTrainer(vae, var, tcfg)

    pool = make_pool(n=64, size=256)
    key = jax.random.PRNGKey(0)
    print("[var-soak] init (jitted)", flush=True)
    t0 = time.time()
    vae_params = jax.jit(
        lambda k, xx: vae.init(k, xx, train=False)["params"]
    )(key, jnp.asarray(pool[:2]))
    state = jax.jit(trainer.init)(key, vae_params, jnp.asarray(pool[:2]))
    print(f"[var-soak] init done in {time.time() - t0:.0f}s", flush=True)

    rows = []
    t_last = time.time()
    for step in range(args.steps):
        rng = np.random.default_rng(step)
        idx = rng.choice(len(pool), args.batch, replace=False)
        imgs = jnp.asarray(pool[idx])
        labels = jnp.asarray(idx % 10, jnp.int32)
        state, m = trainer.train_step(state, imgs, labels,
                                      jax.random.fold_in(key, step))
        now = time.time()
        rows.append({"step": step, "loss": float(m["loss"]),
                     "acc_mean": float(m["acc_mean"]),
                     "acc_tail": float(m["acc_tail"]),
                     "grad_norm": float(m["grad_norm"]),
                     "step_ms": round((now - t_last) * 1e3, 1)})
        t_last = now
        if step % 25 == 0:
            print(f"[var-soak] step {step} loss={rows[-1]['loss']:.4f} "
                  f"acc={rows[-1]['acc_mean']:.2f}", flush=True)
    return rows, ["step", "loss", "acc_mean", "acc_tail", "grad_norm",
                  "step_ms"]


def soak_rar(args, out: Path):
    import jax
    import jax.numpy as jnp

    from imagefolder_tpu.models.rar import RAR, RARConfig
    from imagefolder_tpu.train.rar_train import (
        RARTrainConfig,
        RARTrainer,
        get_rar_random_ratio,
    )

    cfg = RARConfig(embed_dim=768, depth=24, num_heads=16, mlp_ratio=4.0,
                    image_seq_len=256, codebook_size=1024,
                    condition_num_classes=1000)
    rar = RAR(cfg)
    tcfg = RARTrainConfig(total_steps=args.steps,
                          warmup_steps=max(args.steps // 10, 1),
                          random_ratio_anneal_start=0,
                          random_ratio_anneal_end=args.steps)
    trainer = RARTrainer(rar, tcfg)

    # fixed synthetic token pool: structured (not uniform) so CE can drop
    rng = np.random.default_rng(0)
    base = rng.integers(0, cfg.codebook_size, (32, cfg.image_seq_len))
    pool_tokens = np.concatenate([np.roll(base, s, axis=1)
                                  for s in range(16)])  # 512 rows
    pool_labels = np.tile(np.arange(32) % 1000, 16)

    key = jax.random.PRNGKey(0)
    print("[rar-soak] init", flush=True)
    t0 = time.time()
    state = jax.jit(trainer.init)(key, jnp.asarray(pool_tokens[:2]),
                         jnp.asarray(pool_labels[:2]))
    print(f"[rar-soak] init done in {time.time() - t0:.0f}s", flush=True)

    rows = []
    t_last = time.time()
    for step in range(args.steps):
        srng = np.random.default_rng(step)
        idx = srng.choice(len(pool_tokens), args.batch, replace=False)
        ratio = get_rar_random_ratio(0, args.steps, step)
        state, m = trainer.train_step(
            state, jnp.asarray(pool_tokens[idx], jnp.int32),
            jnp.asarray(pool_labels[idx], jnp.int32),
            jax.random.fold_in(key, step), float(ratio))
        now = time.time()
        rows.append({"step": step, "loss": float(m["loss"]),
                     "correct_tokens": float(m["correct_tokens"]),
                     "grad_norm": float(m["grad_norm"]),
                     "random_ratio": float(ratio),
                     "step_ms": round((now - t_last) * 1e3, 1)})
        t_last = now
        if step % 25 == 0:
            print(f"[rar-soak] step {step} loss={rows[-1]['loss']:.4f} "
                  f"tok_acc={rows[-1]['correct_tokens']:.4f}", flush=True)
    return rows, ["step", "loss", "correct_tokens", "grad_norm",
                  "random_ratio", "step_ms"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", choices=["var", "rar"], required=True)
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default="soak")
    args = ap.parse_args()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    rows, fields = (soak_var if args.workload == "var" else soak_rar)(args,
                                                                     out)
    name = f"{args.workload}_soak"
    with open(out / f"{name}.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        w.writerows(rows)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(14, 4))
    steps = [r["step"] for r in rows]
    axes[0].plot(steps, [r["loss"] for r in rows])
    axes[0].set_title(f"{args.workload.upper()} CE loss")
    acc_key = "acc_mean" if args.workload == "var" else "correct_tokens"
    axes[1].plot(steps, [r[acc_key] for r in rows])
    axes[1].set_title(acc_key)
    axes[2].plot(steps, [r["grad_norm"] for r in rows])
    axes[2].set_title("grad_norm")
    for ax in axes:
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out / f"{name}.png", dpi=110)
    summary = {"workload": args.workload, "steps": args.steps,
               "first": rows[0], "last": rows[-1]}
    (out / f"{name}.json").write_text(json.dumps(summary, indent=1))
    print(f"[{args.workload}-soak] OK: loss {rows[0]['loss']:.4f} -> "
          f"{rows[-1]['loss']:.4f}", flush=True)


if __name__ == "__main__":
    main()
