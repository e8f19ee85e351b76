"""ImageNet-folder input pipeline (collapses the reference's three data
packages — ``dataset/``, ``datasets/``, ``data/`` — into one layer).

ImageFolder-style class discovery, ADM center/random crop (exact parity with
``dataset/augmentation.py``), horizontal flip, [-1, 1] normalization, grain
multiprocess loading with host-overlapped device prefetch (replacing the
reference's CUDA-stream PrefetchLoader, ``datasets/prefetcher.py``).
"""

from __future__ import annotations

import dataclasses
import math
import os
import zlib
from pathlib import Path
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

__all__ = [
    "center_crop_arr", "random_crop_arr", "list_image_folder",
    "ImageFolderSource", "make_dataloader", "device_prefetch",
]

_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp", ".JPEG", ".JPG", ".PNG"}


def center_crop_arr(pil_image: Image.Image, image_size: int) -> np.ndarray:
    """ADM center crop (dataset/augmentation.py:8-28)."""
    while min(*pil_image.size) >= 2 * image_size:
        pil_image = pil_image.resize(
            tuple(x // 2 for x in pil_image.size), resample=Image.BOX)
    scale = image_size / min(*pil_image.size)
    pil_image = pil_image.resize(
        tuple(round(x * scale) for x in pil_image.size), resample=Image.BICUBIC)
    arr = np.array(pil_image)
    cy = (arr.shape[0] - image_size) // 2
    cx = (arr.shape[1] - image_size) // 2
    return arr[cy:cy + image_size, cx:cx + image_size]


def random_crop_arr(pil_image: Image.Image, image_size: int,
                    rng: np.random.Generator,
                    min_crop_frac=0.8, max_crop_frac=1.0) -> np.ndarray:
    """ADM random crop (dataset/augmentation.py:31-60)."""
    min_s = math.ceil(image_size / max_crop_frac)
    max_s = math.ceil(image_size / min_crop_frac)
    smaller = int(rng.integers(min_s, max_s + 1))
    while min(*pil_image.size) >= 2 * smaller:
        pil_image = pil_image.resize(
            tuple(x // 2 for x in pil_image.size), resample=Image.BOX)
    scale = smaller / min(*pil_image.size)
    pil_image = pil_image.resize(
        tuple(round(x * scale) for x in pil_image.size), resample=Image.BICUBIC)
    arr = np.array(pil_image)
    cy = int(rng.integers(arr.shape[0] - image_size + 1))
    cx = int(rng.integers(arr.shape[1] - image_size + 1))
    return arr[cy:cy + image_size, cx:cx + image_size]


def _random_crop_plan(pil_image, image_size: int, rng):
    """ADM random-crop resize plan: returns (resized uint8 array, oy, ox)
    so the crop itself can run in the fused native op."""
    min_s = math.ceil(image_size / 1.0)
    max_s = math.ceil(image_size / 0.8)
    smaller = int(rng.integers(min_s, max_s + 1))
    while min(*pil_image.size) >= 2 * smaller:
        pil_image = pil_image.resize(
            tuple(x // 2 for x in pil_image.size), resample=Image.BOX)
    scale = smaller / min(*pil_image.size)
    pil_image = pil_image.resize(
        tuple(round(x * scale) for x in pil_image.size), resample=Image.BICUBIC)
    arr = np.asarray(pil_image)
    oy = int(rng.integers(arr.shape[0] - image_size + 1))
    ox = int(rng.integers(arr.shape[1] - image_size + 1))
    return arr, oy, ox


def list_image_folder(root: str) -> Tuple[List[str], List[int], List[str]]:
    """torchvision-ImageFolder-compatible scan: class dirs sorted
    lexicographically -> class ids."""
    rootp = Path(root)
    classes = sorted(d.name for d in rootp.iterdir() if d.is_dir())
    files, labels = [], []
    for ci, cname in enumerate(classes):
        for f in sorted((rootp / cname).rglob("*")):
            if f.suffix in _EXTS:
                files.append(str(f))
                labels.append(ci)
    return files, labels, classes


def stable_record_rng(key: str, idx: int) -> np.random.Generator:
    """Deterministic per-record rng for standalone ``source[idx]`` access:
    crc32 (stable across processes/resumes, unlike salted ``hash()``) mixed
    with the record index."""
    return np.random.default_rng((zlib.crc32(key.encode()) ^ idx) & 0x7FFFFFFF)


@dataclasses.dataclass
class ImageFolderSource:
    """grain RandomAccessDataSource over an image folder.

    Augmentation randomness: through ``make_dataloader`` each *visit* draws a
    fresh rng from grain's sampler (seed + global index), so the reference's
    per-epoch redraw semantics hold (``dataset/imagenet.py`` CustomDataset
    draws torch.rand per visit). Standalone ``source[idx]`` uses a stable
    crc32 seed and is deterministic.
    """

    files: Sequence[str]
    labels: Sequence[int]
    image_size: int = 256
    train: bool = True
    hflip: bool = True

    def __len__(self):
        return len(self.files)

    def getitem_with_rng(self, idx: int, rng: np.random.Generator):
        # bad-image retry (reference dataset/openimage.py:24-30): fall back to
        # a neighbouring record instead of killing the worker
        for attempt in range(4):
            try:
                img = Image.open(self.files[idx]).convert("RGB")
                break
            except Exception:
                idx = (idx + 1) % len(self.files)
        else:
            img = Image.new("RGB", (self.image_size, self.image_size))
        from imagefolder_tpu.data._native import crop_flip_normalize

        if self.train:
            # resize per ADM schedule, then fused native crop+flip+normalize
            arr, oy, ox = _random_crop_plan(img, self.image_size, rng)
            flip = bool(self.hflip and rng.random() < 0.5)
            x = crop_flip_normalize(arr, oy, ox, self.image_size, flip)
        else:
            arr = center_crop_arr(img, self.image_size)
            x = crop_flip_normalize(np.ascontiguousarray(arr), 0, 0,
                                    self.image_size, False)
        return {"image": x, "label": np.int32(self.labels[idx])}

    def __getitem__(self, idx: int):
        return self.getitem_with_rng(idx, stable_record_rng(self.files[idx],
                                                            idx))


class _IndexSource:
    """Trivial source yielding record keys; the real record build happens in
    ``_BuildRecordOp`` where grain's per-visit rng is available."""

    def __init__(self, n: int):
        self._n = n

    def __len__(self):
        return self._n

    def __getitem__(self, idx: int):
        return idx

    def __repr__(self):
        # grain validates checkpoints against repr(data_source): must be
        # stable across processes (no default object-identity repr)
        return f"_IndexSource(n={self._n})"


def _build_record_op(source):
    """RandomMapTransform wrapping ``source.getitem_with_rng``: the rng grain
    hands in is seeded from (sampler seed, global visit index), so every epoch
    redraws augmentations (reference per-visit ``torch.rand``) while staying
    deterministic across worker processes and checkpoint resume."""
    import grain.python as grain

    class _BuildRecordOp(grain.RandomMapTransform):
        def __init__(self, src):
            self._src = src

        def random_map(self, idx, rng):
            build = getattr(self._src, "getitem_with_rng", None)
            if build is not None:
                return build(idx, rng)
            return self._src[idx]

    return _BuildRecordOp(source)


def make_grain_loader(source, batch_size: int, *, train: bool = True,
                      seed: int = 0, num_workers: int = 8,
                      num_epochs: Optional[int] = None, shard_index: int = 0,
                      shard_count: int = 1, drop_remainder: bool = True):
    """grain DataLoader over any RandomAccess source: shuffled, sharded across
    hosts, worker-parallel decode, per-visit augmentation rng."""
    import grain.python as grain

    # grain batches per worker: keep every worker's shard >= one batch, or
    # small datasets would yield undersized/empty batches
    num_workers = max(0, min(num_workers, len(source) // max(batch_size, 1)))
    sampler = grain.IndexSampler(
        num_records=len(source),
        shuffle=train,
        seed=seed,
        num_epochs=num_epochs,
        shard_options=grain.ShardOptions(shard_index, shard_count,
                                         drop_remainder=train),
    )
    return grain.DataLoader(
        data_source=_IndexSource(len(source)),
        sampler=sampler,
        operations=[_build_record_op(source),
                    grain.Batch(batch_size, drop_remainder=drop_remainder)],
        worker_count=num_workers,
    )


def make_dataloader(root: str, batch_size: int, image_size: int = 256, *,
                    train: bool = True, seed: int = 0, num_workers: int = 8,
                    num_epochs: Optional[int] = None, shard_index: int = 0,
                    shard_count: int = 1, drop_remainder: bool = True):
    """grain DataLoader over an ImageFolder tree (reference
    DataLoader+DistributedSampler, xqgan_train.py:232-247)."""
    files, labels, _ = list_image_folder(root)
    source = ImageFolderSource(files, labels, image_size, train)
    return make_grain_loader(
        source, batch_size, train=train, seed=seed, num_workers=num_workers,
        num_epochs=num_epochs, shard_index=shard_index,
        shard_count=shard_count, drop_remainder=drop_remainder)


class PrefetchIterator:
    """Host->device prefetch: keep `size` batches in flight (replaces the
    reference's CUDA-stream prefetcher, datasets/prefetcher.py:64-119).

    Checkpointable: ``state`` returns the wrapped grain iterator's state as
    of the last *consumed* batch (not the prefetched-ahead position), so a
    resumed run continues the exact unbroken batch stream — the reference's
    ``DistInfiniteBatchSampler.start_ep/start_it`` semantics
    (utils/data_sampler.py:67-103). Each queue entry pairs the device batch
    with the iterator state snapshotted right after that batch was pulled
    (i.e. the state that resumes at the following batch).
    """

    def __init__(self, it: Iterator, size: int = 2):
        import collections

        self._it = iter(it)
        self._queue = collections.deque()
        self._size = size
        self._state = self._snapshot()  # resume-at-start state
        for _ in range(size):
            self._pull()

    def _snapshot(self):
        get = getattr(self._it, "get_state", None)
        return get() if get is not None else None

    def _pull(self):
        import jax

        try:
            batch = next(self._it)
        except StopIteration:
            return
        self._queue.append((jax.device_put(batch), self._snapshot()))

    def __iter__(self):
        return self

    def __next__(self):
        if not self._queue:
            raise StopIteration
        batch, state = self._queue.popleft()
        if state is not None:
            self._state = state
        self._pull()
        return batch

    @property
    def state(self):
        """Wrapped-iterator state resuming after the last consumed batch
        (bytes for grain; None when the source isn't checkpointable)."""
        return self._state


def device_prefetch(it: Iterator, size: int = 2) -> PrefetchIterator:
    return PrefetchIterator(it, size)
