"""RAR / MaskGIT generator training CLI (reference ``scripts/train_rar.py``
+ ``utils/train_utils.py:641``, model_type rar|maskgit).

Fast path: pretokenized JSONL (from scripts/pretokenize.py). On-the-fly
tokenization: pass --config + --vq_ckpt + --data_path instead of --jsonl
(reference train_utils.py:676-686).

Periodic preview generation (reference ``generate_images``,
``utils/train_utils.py:769-794,914-951``): every ``--generate_every`` steps
the EMA weights sample an 8-image class grid, decoded by the tokenizer to a
PNG under ``<output>/train_generated_images/`` and logged to wandb/TB.
Previews need the tokenizer — pass --config/--vq_ckpt alongside --jsonl (the
reference always constructs it, ``scripts/train_rar.py:94``).

Usage:
    python scripts/train_rar.py --jsonl pretokenized.jsonl [--model rar]
    python scripts/train_rar.py --config configs/RobustTok.yaml \
        --vq_ckpt ckpt --data_path /data/train --model maskgit
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

    def batches(self, batch_size, seed=0, shard_index=0, shard_count=1):
        return _JsonlBatchIter(self.rows, batch_size, seed, shard_index,
                               shard_count)


class _JsonlBatchIter:
    """Infinite epoch-seeded-permutation batch stream with exact-resume
    state (reference DistInfiniteBatchSampler.start_ep/start_it,
    utils/data_sampler.py:67-103): epoch-seeded global permutation, strided
    per-process slice, (epoch, cursor) checkpointable via
    get_state/set_state."""

    def __init__(self, rows, batch_size, seed=0, shard_index=0,
                 shard_count=1):
        if len(rows) // max(shard_count, 1) < batch_size:
            raise ValueError(
                f"per-shard rows ({len(rows)}//{shard_count}) < batch_size "
                f"({batch_size}): the epoch permutation can never fill one "
                "batch — shrink --batch_size or the process count")
        self.rows = rows
        self.batch_size = batch_size
        self.seed = seed
        self.shard_index = shard_index
        self.shard_count = shard_count
        self.epoch = 0
        self.cursor = 0
        self._idx = None

    def _epoch_idx(self):
        if self._idx is None:
            rng = np.random.default_rng((self.seed, self.epoch))
            self._idx = rng.permutation(
                len(self.rows))[self.shard_index::self.shard_count]
        return self._idx

    def __iter__(self):
        return self

    def __next__(self):
        idx = self._epoch_idx()
        if self.cursor + self.batch_size > len(idx):
            self.epoch += 1
            self.cursor = 0
            self._idx = None
            idx = self._epoch_idx()
        rows = [self.rows[j]
                for j in idx[self.cursor:self.cursor + self.batch_size]]
        self.cursor += self.batch_size
        return (np.asarray([r["tokens"] for r in rows], np.int32),
                np.asarray([r["class_id"] for r in rows], np.int32))

    def get_state(self) -> bytes:
        return json.dumps({"epoch": self.epoch,
                           "cursor": self.cursor}).encode()

    def set_state(self, blob: bytes):
        st = json.loads(blob.decode())
        self.epoch, self.cursor = st["epoch"], st["cursor"]
        self._idx = None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--jsonl", default=None)
    ap.add_argument("--config", default=None, help="tokenizer yaml (on-the-fly)")
    ap.add_argument("--vq_ckpt", default=None)
    ap.add_argument("--data_path", default=None)
    ap.add_argument("--model", choices=["rar", "maskgit"], default="rar")
    ap.add_argument("--maskgit_arch", choices=["bert", "uvit"],
                default="bert", help="MaskGIT trunk: ImageBert or UViTBert (RAR/maskgit.py:209)")
    ap.add_argument("--output", default="output/rar")
    ap.add_argument("--hidden", type=int, default=768)
    ap.add_argument("--depth", type=int, default=24)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--codebook_size", type=int, default=4096)
    ap.add_argument("--num_classes", type=int, default=1000,
                    help="condition_num_classes (robustTok-rar.yaml)")
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--total_steps", type=int, default=250_000)
    ap.add_argument("--ckpt_every", type=int, default=10_000)
    ap.add_argument("--log_every", type=int, default=100)
    ap.add_argument("--generate_every", type=int, default=0,
                    help="steps between EMA preview grids (0 = off; "
                         "reference experiment.generate_every)")
    ap.add_argument("--guidance_scale", type=float, default=3.0)
    ap.add_argument("--guidance_scale_pow", type=float, default=2.75)
    ap.add_argument("--temperature", type=float, default=2.0,
                    help="randomize_temperature for previews "
                         "(train_utils.py:925)")
    ap.add_argument("--wandb", action="store_true")
    from imagefolder_tpu.parallel.mesh import add_distributed_args, init_from_args

    add_distributed_args(ap)
    args = ap.parse_args()
    init_from_args(args)

    from imagefolder_tpu.models import build_rar
    from imagefolder_tpu.models.rar import rar_generate
    from imagefolder_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from imagefolder_tpu.train.rar_train import (
        RARTrainConfig,
        RARTrainer,
        get_rar_random_ratio,
    )
    from imagefolder_tpu.utils.ckpt import CheckpointManager
    from imagefolder_tpu.utils.logging import MetricLogger, Tracker, create_logger

    assert args.batch_size % jax.process_count() == 0
    local_bs = args.batch_size // jax.process_count()
    logger = create_logger(args.output)
    tok = _load_tokenizer(args) if (args.config and args.vq_ckpt) else None
    dec_fn = _make_decode_fn(tok[0]) if tok is not None else None
    if args.jsonl:
        data = JsonlTokens(args.jsonl)
        seq_len = len(data.rows[0]["tokens"])
        batches = data.batches(local_bs,
                               shard_index=jax.process_index(),
                               shard_count=jax.process_count())
        logger.info(f"{len(data)} pretokenized rows, seq_len={seq_len}")
    else:
        assert tok is not None and args.data_path, \
            "on-the-fly mode needs --config --vq_ckpt --data_path"
        batches, seq_len, codebook_size = _online_tokens(args, tok)
        args.codebook_size = codebook_size
        logger.info(f"on-the-fly tokenization, seq_len={seq_len}")
    if args.generate_every and tok is None:
        logger.info("previews disabled: --generate_every needs the tokenizer "
                    "(--config + --vq_ckpt)")
    tracker = Tracker(use_wandb=args.wandb, log_dir=args.output, use_tb=True)

    if args.model == "maskgit":
        return _train_maskgit(args, batches, seq_len, logger, tok, tracker,
                              dec_fn)
    rar = build_rar(seq_len=seq_len, codebook_size=args.codebook_size,
                    hidden=args.hidden, depth=args.depth, heads=args.heads,
                    num_classes=args.num_classes, dtype_str="bfloat16")
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
    gen_fn = None
    if tok is not None and args.generate_every:
        # KV cache in the activation dtype (see sample_rar.py)
        gen_fn = jax.jit(lambda p, c, k: rar_generate(
            rar, p, c, k, guidance_scale=args.guidance_scale,
            randomize_temperature=args.temperature,
            guidance_scale_pow=args.guidance_scale_pow,
            cache_dtype=rar.config.dtype))
    it = batches
    if start and hasattr(it, "set_state") and ckpt.apply_data_state(
            start, it, log=logger.info):
        logger.info("restored data-stream state")
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
            host = {k: float(v) for k, v in metrics.items()}
            mlog.update(**host, random_ratio=ratio)
            mlog.log(step + 1, args.total_steps)
            tracker.log(dict(host, random_ratio=ratio), step + 1)
        if (step + 1) % args.ckpt_every == 0:
            ckpt.save(step + 1, jax.device_get(state))
            if hasattr(it, "get_state"):
                ckpt.save_data_state(step + 1, it.get_state())
        if gen_fn is not None and (step + 1) % args.generate_every == 0:
            # EMA weights sample the preview (train_utils.py:777-780)
            _generate_preview(gen_fn, dec_fn, tok, state.ema_params, args,
                              step + 1, tracker, logger)
    ckpt.save(args.total_steps, jax.device_get(state))
    ckpt.wait()


def _load_tokenizer(args):
    """Frozen tokenizer for previews / on-the-fly tokenization (reference
    create_pretrained_tokenizer, utils/train_utils.py:79-98)."""
    from imagefolder_tpu.models.tokenizer import VQModel
    from imagefolder_tpu.utils.config import load_tokenizer_config
    from scripts.pretokenize import _load_params

    margs, _, _ = load_tokenizer_config(args.config)
    model = VQModel(margs)
    params = _load_params(args.vq_ckpt, model, margs)
    return model, params, margs


def _make_decode_fn(vae):
    """One jitted tokenizer decode per process, built alongside the model it
    closes over (a per-call cache would silently pin the first model seen)."""
    from imagefolder_tpu.models.tokenizer import VQModel

    return jax.jit(lambda p, t: vae.apply(
        {"params": p}, t, method=VQModel.decode_tokens))


def _generate_preview(gen_fn, dec_fn, tok, gen_params, args, step, tracker,
                      logger):
    """Preview grid from the EMA weights (reference generate_images,
    utils/train_utils.py:914-951): generate 8 class-conditioned samples,
    decode with the tokenizer, save PNG + log the image."""
    import jax
    import numpy as np

    from imagefolder_tpu.utils.viz import generation_grid, save_png

    if jax.process_index() != 0:
        return
    _, vae_params, _ = tok
    if jax.process_count() > 1:
        gen_params = jax.device_get(gen_params)
    lbls = jnp.asarray(np.random.default_rng(0).choice(
        args.num_classes, 8).astype(np.int32))
    toks = gen_fn(gen_params, lbls, jax.random.PRNGKey(step))
    imgs = dec_fn(vae_params, toks)  # [-1, 1]
    grid = generation_grid(np.asarray(imgs), ncol=8)
    out = (Path(args.output) / "train_generated_images"
           / f"{step:08d}_s-generated.png")
    save_png(grid, out)
    tracker.log_image("Train Generated", grid, step)
    logger.info(f"preview grid -> {out}")


def _online_tokens(args, tok):
    """On-the-fly tokenization stream (reference train_utils.py:676-686)."""
    import jax
    import jax.numpy as jnp

    from imagefolder_tpu.data.imagenet import make_dataloader
    from imagefolder_tpu.models.tokenizer import VQModel

    model, params, margs = tok
    enc = jax.jit(lambda p, x: model.apply({"params": p}, x,
                                           method=VQModel.encode_to_tokens))
    seq_len = margs.num_latent_tokens * margs.product_quant

    def gen():
        loader = make_dataloader(args.data_path,
                                 args.batch_size // jax.process_count(),
                                 margs.image_size, train=True,
                                 shard_index=jax.process_index(),
                                 shard_count=jax.process_count())
        while True:
            for b in loader:
                toks = enc(params, jnp.asarray(b["image"]))
                yield jax.device_get(toks), b["label"]

    return gen(), seq_len, margs.codebook_size


def _train_maskgit(args, batches, seq_len, logger, tok=None, tracker=None,
                   dec_fn=None):
    """MaskGIT masked-modeling loop (reference model_type='maskgit')."""
    import jax
    import jax.numpy as jnp
    import optax

    from imagefolder_tpu.models import build_maskgit
    from imagefolder_tpu.models.maskgit import (
        mask_input_tokens, maskgit_generate, mlm_loss)
    from imagefolder_tpu.utils.ckpt import CheckpointManager
    from imagefolder_tpu.utils.logging import MetricLogger

    model = build_maskgit(seq_len=seq_len, codebook_size=args.codebook_size,
                          hidden=args.hidden, depth=args.depth,
                          heads=args.heads, num_classes=args.num_classes,
                          dtype_str="bfloat16", arch=args.maskgit_arch)
    cfg = model.config
    key = jax.random.PRNGKey(0)
    toks0 = jnp.zeros((2, seq_len), jnp.int32)
    params = model.init({"params": key}, toks0, jnp.zeros((2,), jnp.int32),
                        rng=key)["params"]
    tx = optax.adamw(optax.warmup_cosine_decay_schedule(
        0.0, 2e-4, args.total_steps // 20, args.total_steps), weight_decay=0.03)
    opt = tx.init(params)

    @jax.jit
    def step_fn(params, opt, toks, labels, k):
        k1, k2 = jax.random.split(k)
        masked, masks = mask_input_tokens(toks, k1, cfg.mask_token_id)

        def loss_fn(p):
            logits = model.apply({"params": p}, masked, labels,
                                 cond_drop_prob=0.1, rng=k2)
            return mlm_loss(logits, toks, masks)

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt, loss, acc

    gen_fn = None
    if tok is not None and args.generate_every:
        def gen_fn(p, c, k):  # python decode loop; fwd passes jitted inside
            return maskgit_generate(
                model, p, c, k, guidance_scale=args.guidance_scale,
                guidance_decay="constant",
                guidance_scale_pow=args.guidance_scale_pow,
                randomize_temperature=args.temperature, num_sample_steps=8)

    ckpt = CheckpointManager(args.output)
    mlog = MetricLogger(logger, args.log_every)
    for step in range(args.total_steps):
        toks, labels = next(batches)
        params, opt, loss, acc = step_fn(params, opt, jnp.asarray(toks),
                                         jnp.asarray(labels),
                                         jax.random.fold_in(key, step))
        if (step + 1) % args.log_every == 0:
            mlog.update(loss=float(loss), correct_tokens=float(acc))
            mlog.log(step + 1, args.total_steps)
            if tracker is not None:
                tracker.log({"loss": float(loss),
                             "correct_tokens": float(acc)}, step + 1)
        if (step + 1) % args.ckpt_every == 0:
            ckpt.save(step + 1, jax.device_get({"params": params}))
        if gen_fn is not None and (step + 1) % args.generate_every == 0:
            _generate_preview(gen_fn, dec_fn, tok, params, args, step + 1,
                              tracker, logger)
    ckpt.save(args.total_steps, jax.device_get({"params": params}))
    ckpt.wait()


if __name__ == "__main__":
    main()
