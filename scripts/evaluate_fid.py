"""Evaluator CLI: ref npz + sample npz -> FID, sFID, IS, Precision, Recall.

Protocol parity with the reference ``evaluator.py:27-60`` (the OpenAI
guided-diffusion evaluator the reference ships for gFID):

- activations are InceptionV3 pool3 (2048-d) and spatial (Mixed_6e first 7
  channels, 7*17*17-d) features over ``arr_0`` uint8 NHWC batches
  (``evaluator.py:151-172``),
- a ref npz that already carries ``mu``/``sigma``/``mu_s``/``sigma_s`` is
  used as-is (``evaluator.py:174-187``),
- Inception Score from the 1008-way softmax (``evaluator.py:195-206``),
- improved precision/recall on pool3 features (``evaluator.py:210-216``).

The extractor is the converted pytorch-fid InceptionV3
(``imagefolder_tpu/eval/inception.py``) — no TF1 runtime. Pass the torch
checkpoint via --inception_ckpt; --random_inception runs the full pipeline
with untrained weights (useful to drive the protocol without the asset; the
numbers are meaningless).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from imagefolder_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import numpy as np  # noqa: E402


def load_inception(inception_ckpt=None):
    """Returns (jitted feature fn over uint8 NHWC [0,255], variables)."""
    import jax

    from imagefolder_tpu.eval.inception import (
        InceptionV3,
        convert_inception_checkpoint,
    )

    model = InceptionV3()
    if inception_ckpt is not None:
        import torch

        from imagefolder_tpu.eval.inception import inception_gate_status

        if inception_gate_status(inception_ckpt) is None:
            print(
                "WARNING: the Inception port has NOT been validated against "
                f"this checkpoint ({inception_ckpt}).\n"
                "         FID/sFID/IS numbers are NOT trustworthy until the "
                "real-weight gate has run once:\n"
                f"         python scripts/verify_zoo.py --inception_ckpt "
                f"{inception_ckpt}", file=sys.stderr, flush=True)
        sd = torch.load(inception_ckpt, map_location="cpu", weights_only=False)
        variables = convert_inception_checkpoint(sd)
    else:
        import jax.numpy as jnp

        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    @jax.jit
    def feat_fn(x_uint8):
        x01 = x_uint8.astype("float32") / 255.0
        return model.apply(variables, x01)

    return feat_fn


def compute_activations(arr, feat_fn, batch_size=64, verbose=True):
    """uint8 (N,H,W,3) -> (pool3 (N,2048), spatial (N,2023), softmax (N,1008)).

    Mirrors evaluator.py:151-172; the last partial batch is padded to the
    jit batch shape and sliced (static shapes for XLA)."""
    pools, spatials, softs = [], [], []
    n = len(arr)
    for i in range(0, n, batch_size):
        b = arr[i:i + batch_size]
        nb = len(b)
        if nb < batch_size:
            b = np.concatenate(
                [b, np.zeros((batch_size - nb,) + b.shape[1:], b.dtype)])
        out = feat_fn(b)
        pools.append(np.asarray(out["pool3"])[:nb])
        spatials.append(np.asarray(out["spatial"])[:nb])
        softs.append(np.asarray(out["softmax"])[:nb])
        if verbose and (i // batch_size) % 50 == 0:
            print(f"  {i + nb}/{n}", file=sys.stderr)
    return (np.concatenate(pools), np.concatenate(spatials),
            np.concatenate(softs))


def read_batch(path):
    with np.load(path) as obj:
        return obj["arr_0"]


def read_statistics(path, acts):
    """evaluator.py:174-187: precomputed mu/sigma in the npz win."""
    from imagefolder_tpu.eval.fid import FIDStatistics, compute_statistics

    with np.load(path) as obj:
        if "mu" in obj:
            return (FIDStatistics(obj["mu"], obj["sigma"]),
                    FIDStatistics(obj["mu_s"], obj["sigma_s"]))
    return compute_statistics(acts[0]), compute_statistics(acts[1])


def evaluate(ref_batch, sample_batch, feat_fn, batch_size=64, verbose=True):
    """Full evaluator.py main protocol. Returns a dict of the five metrics."""
    from imagefolder_tpu.eval.fid import inception_score, precision_recall

    def log(msg):
        if verbose:
            print(msg)

    log("computing reference batch activations...")
    ref_has_stats = False
    with np.load(ref_batch) as obj:
        ref_has_stats = "mu" in obj
    if ref_has_stats:
        # stats-only ref npz still needs pool3 features for precision/recall
        ref_arr = read_batch(ref_batch)
        ref_acts = compute_activations(ref_arr, feat_fn, batch_size, verbose)
    else:
        ref_acts = compute_activations(read_batch(ref_batch), feat_fn,
                                       batch_size, verbose)
    log("computing/reading reference batch statistics...")
    ref_stats, ref_stats_spatial = read_statistics(ref_batch, ref_acts)

    log("computing sample batch activations...")
    sample_acts = compute_activations(read_batch(sample_batch), feat_fn,
                                      batch_size, verbose)
    log("computing/reading sample batch statistics...")
    sample_stats, sample_stats_spatial = read_statistics(sample_batch,
                                                         sample_acts)

    log("Computing evaluations...")
    metrics = {}
    metrics["inception_score"] = inception_score(sample_acts[2])
    metrics["fid"] = sample_stats.frechet_distance(ref_stats)
    metrics["sfid"] = sample_stats_spatial.frechet_distance(ref_stats_spatial)
    prec, recall = precision_recall(ref_acts[0], sample_acts[0])
    metrics["precision"], metrics["recall"] = prec, recall
    log(f"Inception Score: {metrics['inception_score']}")
    log(f"FID: {metrics['fid']}")
    log(f"sFID: {metrics['sfid']}")
    log(f"Precision: {metrics['precision']}")
    log(f"Recall: {metrics['recall']}")
    return metrics


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ref_batch", help="path to reference batch npz file")
    ap.add_argument("sample_batch", help="path to sample batch npz file")
    ap.add_argument("--inception_ckpt", default=None,
                    help="pytorch-fid InceptionV3 torch checkpoint")
    ap.add_argument("--random_inception", action="store_true",
                    help="drive the protocol with untrained inception "
                         "weights (numbers are meaningless)")
    ap.add_argument("--batch_size", type=int, default=64)
    args = ap.parse_args()
    if args.inception_ckpt is None and not args.random_inception:
        ap.error("pass --inception_ckpt (or --random_inception to smoke-test)")
    feat_fn = load_inception(args.inception_ckpt)
    evaluate(args.ref_batch, args.sample_batch, feat_fn, args.batch_size)


if __name__ == "__main__":
    main()
