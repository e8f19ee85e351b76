"""Webdataset-style tar-shard ingestion (reference
``data/webdataset_reader.py`` — SimpleImageDataset over resampled shards).

A dependency-free reader for brace-expanded shard lists
(``shards-{000000..000127}.tar``) of (jpg/png, cls|json) pairs, with
per-worker shard splitting, resampling, decode->crop->normalize, and the
``with_epoch`` style length accounting. Yields the same dict schema as
``data.imagenet`` so trainers are source-agnostic.
"""

from __future__ import annotations

import io
import json
import re
import tarfile
from pathlib import Path
from typing import Iterator, List, Optional

import numpy as np
from PIL import Image

from imagefolder_tpu.data.imagenet import center_crop_arr, random_crop_arr

__all__ = ["expand_shard_urls", "iter_shard", "WebDatasetReader"]

_BRACE = re.compile(r"\{(\d+)\.\.(\d+)\}")


def expand_shard_urls(pattern: str) -> List[str]:
    """'a-{000..003}.tar' -> ['a-000.tar', ..., 'a-003.tar']."""
    m = _BRACE.search(pattern)
    if not m:
        return [pattern]
    lo, hi = m.group(1), m.group(2)
    width = len(lo)
    return [
        pattern[:m.start()] + str(i).zfill(width) + pattern[m.end():]
        for i in range(int(lo), int(hi) + 1)
    ]


_IMG_EXTS = {".jpg", ".jpeg", ".png", ".webp"}


def iter_shard(path: str) -> Iterator[dict]:
    """Group tar members by key (webdataset convention: key.ext)."""
    with tarfile.open(path) as tf:
        current_key, sample = None, {}
        for member in tf:
            if not member.isfile():
                continue
            name = Path(member.name)
            key, ext = name.stem, name.suffix.lower()
            if key != current_key:
                if current_key is not None and sample:
                    yield sample
                current_key, sample = key, {"__key__": key}
            data = tf.extractfile(member).read()
            if ext in _IMG_EXTS:
                sample["image_bytes"] = data
            elif ext == ".cls":
                sample["label"] = int(data.decode().strip())
            elif ext == ".json":
                sample.update(json.loads(data))
        if current_key is not None and sample:
            yield sample


class WebDatasetReader:
    """Sharded, optionally resampled reader (webdataset_reader.py:100-216).

    train=True: shuffle shard order per epoch, random crop + hflip;
    min_size/res_ratio filtering like the reference (:160-178)."""

    def __init__(self, shard_pattern: str, image_size: int = 256, *,
                 train: bool = True, seed: int = 0, shard_index: int = 0,
                 shard_count: int = 1, min_size: int = 0,
                 max_res_ratio: Optional[float] = None):
        self.shards = expand_shard_urls(shard_pattern)[shard_index::shard_count]
        if not self.shards:
            raise ValueError(f"no shards for {shard_pattern!r}")
        self.image_size = image_size
        self.train = train
        self.seed = seed
        self.min_size = min_size
        self.max_res_ratio = max_res_ratio

    def __iter__(self):
        rng = np.random.default_rng(self.seed)
        order = rng.permutation(len(self.shards)) if self.train \
            else np.arange(len(self.shards))
        for si in order:
            for sample in iter_shard(self.shards[si]):
                if "image_bytes" not in sample:
                    continue
                try:
                    img = Image.open(io.BytesIO(sample["image_bytes"]))
                    img = img.convert("RGB")
                except Exception:
                    continue  # warn_and_continue (webdataset_reader.py:145)
                w, h = img.size
                if min(w, h) < self.min_size:
                    continue
                if self.max_res_ratio and max(w, h) / min(w, h) > self.max_res_ratio:
                    continue
                if self.train:
                    arr = random_crop_arr(img, self.image_size, rng)
                    if rng.random() < 0.5:
                        arr = arr[:, ::-1]
                else:
                    arr = center_crop_arr(img, self.image_size)
                x = arr.astype(np.float32) / 255.0 * 2.0 - 1.0
                yield {"image": np.ascontiguousarray(x),
                       "label": np.int32(sample.get("label", -1))}

    def batches(self, batch_size: int):
        buf_img, buf_lbl = [], []
        for s in self:
            buf_img.append(s["image"])
            buf_lbl.append(s["label"])
            if len(buf_img) == batch_size:
                yield {"image": np.stack(buf_img), "label": np.asarray(buf_lbl)}
                buf_img, buf_lbl = [], []
