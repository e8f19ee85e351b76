"""In-training evaluation loops.

Reference machinery this reproduces:

* tokenizer val rFID + best-checkpoint gate —
  ``tokenizer/tokenizer_image/xqgan_train.py:516-569`` (full val split,
  uint8 ``clamp(127.5x+128, 0, 255)`` protocol at ``:524-557``, FID via the
  OpenAI evaluator, best ckpt kept by FID);
* VAR ``eval_ep`` — ``trainer.py:58-101`` (val CE mean/tail + token-accuracy
  mean/tail with label_smooth=0, allreduced over ranks);
* periodic preview generation — ``trainer.py:89`` (VAR CFG grid) and
  ``utils/train_utils.py:769-794,914-951`` (RAR ``generate_images``).

TPU-first shape discipline: loaders may yield a ragged final batch; every
device call here pads to the first batch's static shape and slices (or
mask-weights) on the host, so each eval loop compiles exactly once.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import jax
import numpy as np

from imagefolder_tpu.eval.fid import compute_statistics, frechet_distance
from imagefolder_tpu.utils.viz import to_uint8

__all__ = ["pad_to_batch", "tokenizer_val_rfid", "tokenizer_val_psnr",
           "var_eval_ep"]


def pad_to_batch(arr: np.ndarray, batch: int):
    """Pad the leading dim up to ``batch`` (static jit shapes); returns
    (padded, true_n)."""
    n = arr.shape[0]
    if n == batch:
        return arr, n
    pad = np.zeros((batch - n,) + arr.shape[1:], arr.dtype)
    return np.concatenate([arr, pad]), n


def _gather_rows(feats: np.ndarray) -> np.ndarray:
    """Multi-host: concatenate every process's activation rows (the
    reference all-gathers the uint8 samples, xqgan_train.py:529-530; rows of
    pooled features are ~25x smaller, same math).

    Ragged-safe: the val split shards without drop_remainder (ShardOptions
    ``drop_remainder=train`` in data/imagenet.py), so per-host row counts can
    differ by one batch — pad to the max count, gather, trim per host."""
    if jax.process_count() == 1:
        return feats
    from imagefolder_tpu.parallel.mesh import process_allgather

    counts = np.asarray(
        process_allgather(np.asarray([feats.shape[0]], np.int64))
    ).reshape(-1)
    m = int(counts.max())
    padded = np.zeros((m,) + feats.shape[1:], feats.dtype)
    padded[: feats.shape[0]] = feats
    rows = np.asarray(process_allgather(padded))  # (P, m, ...)
    return np.concatenate(
        [rows[p, : int(counts[p])] for p in range(len(counts))], axis=0)


def tokenizer_val_rfid(rec_fn, params, loader: Iterable, feat_fn,
                       batch_size: int, max_batches: Optional[int] = None,
                       log: Callable[[str], None] = lambda s: None,
                       gt_cache: Optional[dict] = None) -> float:
    """Full-val reconstruction FID (xqgan_train.py:516-567).

    ``rec_fn(params, imgs_pm1) -> recon_pm1`` and ``feat_fn(uint8 NHWC) ->
    {"pool3": (B, 2048), ...}`` must both be jitted by the caller with static
    batch shapes. Activations are streamed (never 50k images in host RAM) and
    gathered across processes before the Frechet distance.

    ``gt_cache``: pass the same dict across calls to compute the (invariant)
    ground-truth statistics once per run — valid only while the val loader
    and ``max_batches`` stay fixed, which in-training validation guarantees."""
    have_gt = gt_cache is not None and "stats" in gt_cache
    gt_acts, rec_acts, total = [], [], 0
    for i, b in enumerate(loader):
        if max_batches is not None and i >= max_batches:
            break
        x, n = pad_to_batch(np.asarray(b["image"]), batch_size)
        r = rec_fn(params, x)
        # uint8 protocol: clamp(127.5x + 128, 0, 255) (xqgan_train.py:524-557)
        rec_u8 = to_uint8(np.asarray(r)[:n])
        rec_pad, _ = pad_to_batch(rec_u8, batch_size)
        rec_acts.append(np.asarray(feat_fn(rec_pad)["pool3"])[:n])
        if not have_gt:
            gt_u8 = to_uint8(x[:n])
            gt_pad, _ = pad_to_batch(gt_u8, batch_size)
            gt_acts.append(np.asarray(feat_fn(gt_pad)["pool3"])[:n])
        total += n
    rec = _gather_rows(np.concatenate(rec_acts))
    if have_gt:
        s_gt = gt_cache["stats"]
    else:
        s_gt = compute_statistics(_gather_rows(np.concatenate(gt_acts)))
        if gt_cache is not None:
            gt_cache["stats"] = s_gt
    log(f"val rFID over {len(rec)} images ({total} on this host)")
    s_rec = compute_statistics(rec)
    return frechet_distance(s_rec.mu, s_rec.sigma, s_gt.mu, s_gt.sigma)


def tokenizer_val_psnr(rec_fn, params, loader: Iterable, batch_size: int,
                       max_batches: Optional[int] = None) -> float:
    """PSNR proxy used when no Inception weights are available (the
    reference has no such fallback — it simply cannot save_best without the
    TF graph; we degrade gracefully instead)."""
    from imagefolder_tpu.eval.psnr_ssim import psnr

    vals = []
    for i, b in enumerate(loader):
        if max_batches is not None and i >= max_batches:
            break
        x, n = pad_to_batch(np.asarray(b["image"]), batch_size)
        r = np.asarray(rec_fn(params, x))[:n]
        vals.append(np.asarray(psnr(x[:n] * 0.5 + 0.5, r * 0.5 + 0.5)))
    m = _gather_rows(np.concatenate(vals))
    return float(np.mean(m))


def var_eval_ep(eval_step, loader: Iterable, batch_size: int,
                max_batches: Optional[int] = None) -> dict:
    """VAR validation epoch (trainer.py:58-101): per-sample CE/acc summed on
    the host, divided by the global sample count (the reference's allreduced
    ``stats / tot``). ``eval_step(imgs, labels) -> dict of (B,) per-sample
    vectors`` must be jitted by the caller."""
    sums = {k: 0.0 for k in ("L_mean", "L_tail", "acc_mean", "acc_tail")}
    tot = 0
    for i, b in enumerate(loader):
        if max_batches is not None and i >= max_batches:
            break
        x, n = pad_to_batch(np.asarray(b["image"]), batch_size)
        y, _ = pad_to_batch(np.asarray(b["label"]), batch_size)
        out = eval_step(x, y)
        for k in sums:
            sums[k] += float(np.sum(np.asarray(out[k])[:n]))
        tot += n
    row = np.asarray([sums[k] for k in sums] + [tot], np.float64)
    if jax.process_count() > 1:
        from imagefolder_tpu.parallel.mesh import process_allgather

        row = np.sum(process_allgather(row), axis=0)
    tot = max(row[-1], 1.0)
    return {"val_" + k: row[j] / tot
            for j, k in enumerate(sums)} | {"val_tot": int(row[-1])}
