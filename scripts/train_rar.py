"""RAR generator training CLI (reference ``scripts/train_rar.py`` +
``utils/train_utils.py:641``).

Fast path: pretokenized JSONL (from scripts/pretokenize.py). On-the-fly
tokenization is supported with --vq_ckpt.

Usage:
    python scripts/train_rar.py --jsonl pretokenized.jsonl \
        [--hidden 768 --depth 24 --heads 16] [key=value ...]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from imagefolder_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import jax
import jax.numpy as jnp
import numpy as np


class JsonlTokens:
    """Pretokenized JSONL reader (reference PretoeknizedDataSetJSONL,
    data/webdataset_reader.py:253)."""

    def __init__(self, path):
        self.rows = [json.loads(l) for l in open(path)]

    def __len__(self):
        return len(self.rows)

    def batches(self, batch_size, seed=0):
        rng = np.random.default_rng(seed)
        while True:
            idx = rng.permutation(len(self.rows))
            for i in range(0, len(idx) - batch_size + 1, batch_size):
                rows = [self.rows[j] for j in idx[i:i + batch_size]]
                yield (np.asarray([r["tokens"] for r in rows], np.int32),
                       np.asarray([r["class_id"] for r in rows], np.int32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--jsonl", required=True)
    ap.add_argument("--output", default="output/rar")
    ap.add_argument("--hidden", type=int, default=768)
    ap.add_argument("--depth", type=int, default=24)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--codebook_size", type=int, default=4096)
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--total_steps", type=int, default=250_000)
    ap.add_argument("--ckpt_every", type=int, default=10_000)
    ap.add_argument("--log_every", type=int, default=100)
    args = ap.parse_args()

    from imagefolder_tpu.models.rar import RAR, RARConfig
    from imagefolder_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from imagefolder_tpu.train.rar_train import (
        RARTrainConfig,
        RARTrainer,
        get_rar_random_ratio,
    )
    from imagefolder_tpu.utils.ckpt import CheckpointManager
    from imagefolder_tpu.utils.logging import MetricLogger, create_logger

    logger = create_logger(args.output)
    data = JsonlTokens(args.jsonl)
    seq_len = len(data.rows[0]["tokens"])
    logger.info(f"{len(data)} pretokenized rows, seq_len={seq_len}")

    rar = RAR(RARConfig(embed_dim=args.hidden, depth=args.depth,
                        num_heads=args.heads, image_seq_len=seq_len,
                        codebook_size=args.codebook_size,
                        dtype_str="bfloat16"))
    tcfg = RARTrainConfig(total_steps=args.total_steps,
                          warmup_steps=args.total_steps // 4,
                          random_ratio_anneal_end=args.total_steps // 2)
    trainer = RARTrainer(rar, tcfg)

    key = jax.random.PRNGKey(0)
    toks0 = jnp.zeros((2, seq_len), jnp.int32)
    state = trainer.init(key, toks0, jnp.zeros((2,), jnp.int32))
    mesh = make_mesh(("data",))
    state = replicate(state, mesh)
    ckpt = CheckpointManager(args.output)
    restored, start = ckpt.restore(state)
    if restored is not None:
        state = restored
        logger.info(f"resumed at {start}")

    mlog = MetricLogger(logger, args.log_every)
    it = data.batches(args.batch_size)
    for step in range(start, args.total_steps):
        toks, labels = next(it)
        ratio = get_rar_random_ratio(tcfg.random_ratio_anneal_start,
                                     tcfg.random_ratio_anneal_end, step)
        batch = shard_batch({"t": jnp.asarray(toks), "l": jnp.asarray(labels)},
                            mesh)
        state, metrics = trainer.train_step(
            state, batch["t"], batch["l"], jax.random.fold_in(key, step),
            ratio)
        if (step + 1) % args.log_every == 0:
            mlog.update(**{k: float(v) for k, v in metrics.items()},
                        random_ratio=ratio)
            mlog.log(step + 1, args.total_steps)
        if (step + 1) % args.ckpt_every == 0:
            ckpt.save(step + 1, jax.device_get(state))
    ckpt.save(args.total_steps, jax.device_get(state))
    ckpt.wait()


if __name__ == "__main__":
    main()
