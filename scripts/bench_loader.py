"""Host input-pipeline benchmark (VERDICT r2 weak #5): can the loader feed
the device?

Measures, on synthetic JPEG data of ImageNet-val-like size (500x375 q87):
  1. full per-record pipeline (PIL decode -> ADM random-crop resize ->
     fused C++ crop/flip/normalize) — img/s per worker core
  2. the fused fastops stage alone (C++ crop+flip+normalize)
  3. a pre-decoded uint8-cache path (np.load + fastops) — the fallback when
     decode-bound
  4. grain end-to-end with worker processes (as many as the host has cores)

Prints one JSON line: per-core rates + the worker count required to sustain
a target device rate (the bench.py img/s). The driver host here has ONE
core, so absolute throughput is meaningless; per-core rate x cores is the
capacity model (grain workers are independent processes, reference
equivalent: DataLoader num_workers, datasets/prefetcher.py:64-119).

Usage: python scripts/bench_loader.py [--target 660] [--n 200]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image


def make_dataset(root, n, w=500, h=375, quality=87):
    rng = np.random.default_rng(0)
    d = os.path.join(root, "train", "cls0")
    os.makedirs(d, exist_ok=True)
    # low-frequency content so JPEG size/decode cost is photo-like
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    for i in range(n):
        base = (
            127 + 80 * np.sin(xx / (17 + i % 13)) * np.cos(yy / (23 + i % 7))
            + rng.normal(0, 12, (h, w))
        )
        img = np.stack([base, np.roll(base, 5, 0), np.roll(base, 9, 1)],
                       axis=-1).clip(0, 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(d, f"{i}.jpg"),
                                  quality=quality)
    return os.path.join(root, "train")


def bench_records(source, n, image_size=256):
    rng = np.random.default_rng(1)
    # warmup
    for i in range(min(8, n)):
        source.getitem_with_rng(i, rng)
    t0 = time.perf_counter()
    for i in range(n):
        source.getitem_with_rng(i % len(source), rng)
    return n / (time.perf_counter() - t0)


def bench_fastops(n, image_size=256):
    from imagefolder_tpu.data._native import crop_flip_normalize

    rng = np.random.default_rng(2)
    arr = rng.integers(0, 256, (image_size + 32, image_size + 32, 3),
                       np.uint8)
    crop_flip_normalize(arr, 0, 0, image_size, True)
    t0 = time.perf_counter()
    for i in range(n):
        crop_flip_normalize(arr, i % 32, (i * 7) % 32, image_size, bool(i & 1))
    return n / (time.perf_counter() - t0)


def bench_predecoded(root, n, image_size=256):
    """uint8-cache path: np.load of a pre-decoded (288,288,3) crop source +
    fastops — what pretokenized/cached pipelines pay per record."""
    from imagefolder_tpu.data._native import crop_flip_normalize

    rng = np.random.default_rng(3)
    path = os.path.join(root, "cache.npy")
    np.save(path, rng.integers(0, 256, (image_size + 32, image_size + 32, 3),
                               np.uint8))
    np.load(path)
    t0 = time.perf_counter()
    for i in range(n):
        arr = np.load(path)
        crop_flip_normalize(arr, i % 32, 0, image_size, False)
    return n / (time.perf_counter() - t0)


def bench_grain(data_root, n, batch_size=64, workers=None):
    from imagefolder_tpu.data.imagenet import make_dataloader

    from imagefolder_tpu.data.imagenet import list_image_folder

    workers = workers if workers is not None else (os.cpu_count() or 1)
    # mirror make_dataloader's clamp (workers <= records/batch) — report the
    # count actually running, or the per-worker capacity model is skewed
    n_records = len(list_image_folder(data_root)[0])
    workers = max(0, min(workers, n_records // max(batch_size, 1)))
    loader = make_dataloader(data_root, batch_size, 256, train=True,
                             num_workers=workers, num_epochs=None, seed=0)
    it = iter(loader)
    next(it)  # spin up workers
    batches = max(n // batch_size, 2)
    t0 = time.perf_counter()
    for _ in range(batches):
        next(it)
    rate = batches * batch_size / (time.perf_counter() - t0)
    del it
    return rate, workers


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", type=float, default=660.0,
                    help="device img/s the loader must sustain (bench.py)")
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--keep", default=None,
                    help="reuse/keep dataset at this dir")
    args = ap.parse_args()

    root = args.keep or tempfile.mkdtemp(prefix="bench_loader_")
    data_root = os.path.join(root, "train")
    if not os.path.isdir(data_root):
        data_root = make_dataset(root, max(args.n, 128))

    from imagefolder_tpu.data.imagenet import ImageFolderSource, list_image_folder

    files, labels, _ = list_image_folder(data_root)
    src = ImageFolderSource(files, labels, 256, train=True)

    r_full = bench_records(src, args.n)
    r_fast = bench_fastops(args.n * 10)
    r_cache = bench_predecoded(root, args.n * 2)
    r_grain, workers = bench_grain(data_root, args.n)

    cores_needed = args.target / r_full
    out = {
        "metric": "host_loader_images_per_sec_per_core",
        "decode_crop_fastops_per_core": round(r_full, 1),
        "fastops_stage_only_per_core": round(r_fast, 1),
        "predecoded_cache_per_core": round(r_cache, 1),
        "grain_end_to_end": round(r_grain, 1),
        "grain_workers": workers,
        "host_cores": os.cpu_count(),
        "target_device_img_per_sec": args.target,
        "worker_cores_needed_for_target": round(cores_needed, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
