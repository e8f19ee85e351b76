"""Dataset registry beyond ImageNet folders — the reference's
``dataset/build.py:8-40`` surface: coco (flat folder), openimage
(image_paths.json), pexels (ImageFolder), imagenet_code (pretokenized npy
codes), and the t2i jsonl family (``dataset/t2i.py``).

Every source is a grain RandomAccessDataSource dict-record producer, so
``make_loader`` (or ``make_dataloader`` for ImageFolder trees) gives the
same sharded/shuffled/prefetched pipeline for all of them.
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path
from typing import Optional

import numpy as np
from PIL import Image

from imagefolder_tpu.data.imagenet import (
    ImageFolderSource,
    center_crop_arr,
    list_image_folder,
    _random_crop_plan,
)

__all__ = [
    "SingleFolderSource", "JsonPathsSource", "CodeSource",
    "Text2ImgImageSource", "Text2ImgSource", "build_dataset", "make_loader",
]


def _load_image_record(path: str, image_size: int, train: bool, idx: int,
                       hflip: bool = True):
    """Shared decode -> ADM crop -> flip -> [-1,1] pipeline (same math as
    ImageFolderSource.__getitem__)."""
    from imagefolder_tpu.data._native import crop_flip_normalize

    img = Image.open(path).convert("RGB")
    rng = np.random.default_rng((hash(path) ^ idx) & 0x7FFFFFFF)
    if train:
        arr, oy, ox = _random_crop_plan(img, image_size, rng)
        flip = bool(hflip and rng.random() < 0.5)
        return crop_flip_normalize(arr, oy, ox, image_size, flip)
    arr = center_crop_arr(img, image_size)
    return crop_flip_normalize(np.ascontiguousarray(arr), 0, 0,
                               image_size, False)


@dataclasses.dataclass
class SingleFolderSource:
    """Flat folder of images, constant label 0 (reference coco builder,
    ``dataset/coco.py:8-27``)."""

    directory: str
    image_size: int = 256
    train: bool = True

    def __post_init__(self):
        d = self.directory
        self.files = sorted(
            os.path.join(d, f) for f in os.listdir(d)
            if os.path.isfile(os.path.join(d, f)))

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx: int):
        x = _load_image_record(self.files[idx], self.image_size, self.train,
                               idx)
        return {"image": x, "label": np.int32(0)}


@dataclasses.dataclass
class JsonPathsSource:
    """``image_paths.json`` manifest relative to the data root, label 0,
    bad-image retry (reference openimage builder,
    ``dataset/openimage.py:11-45``)."""

    data_path: str
    image_size: int = 256
    train: bool = True
    retries: int = 20

    def __post_init__(self):
        manifest = Path(self.data_path) / "image_paths.json"
        if not manifest.exists():
            raise FileNotFoundError(
                f"{manifest} not found — generate the manifest first "
                "(reference: tools/openimage_json.py)")
        self.paths = json.loads(manifest.read_text())

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx: int):
        # reference retries random indices 20x on decode errors
        # (openimage.py:24-30); deterministic neighbour-walk here
        for attempt in range(self.retries):
            try:
                path = os.path.join(self.data_path, self.paths[idx])
                x = _load_image_record(path, self.image_size, self.train, idx)
                return {"image": x, "label": np.int32(0)}
            except Exception:
                idx = (idx + 1) % len(self.paths)
        raise RuntimeError("Too many bad data.")


@dataclasses.dataclass
class CodeSource:
    """Pretokenized npy codes + labels (reference imagenet_code builder,
    ``dataset/imagenet.py:8-51``): optional ten_crop_105 aug dirs mixed in
    at p=0.5, per-sample crop pick when the feature dir is a flip/ten-crop
    dump (features stored (1|2|10, ...))."""

    feature_dir: str
    label_dir: str
    num_records: Optional[int] = None

    def __post_init__(self):
        self.flip = "flip" in self.feature_dir
        aug_f = self.feature_dir.replace("ten_crop/", "ten_crop_105/")
        aug_l = self.label_dir.replace("ten_crop/", "ten_crop_105/")
        self.aug = (aug_f, aug_l) if (
            aug_f != self.feature_dir and os.path.exists(aug_f)
            and os.path.exists(aug_l)) else None
        if self.num_records is None:
            self.num_records = len([
                f for f in os.listdir(self.feature_dir) if f.endswith(".npy")])

    def __len__(self):
        return self.num_records

    def __getitem__(self, idx: int):
        rng = np.random.default_rng(idx)
        fdir, ldir = self.feature_dir, self.label_dir
        if self.aug is not None and rng.random() < 0.5:
            fdir, ldir = self.aug
        feats = np.load(os.path.join(fdir, f"{idx}.npy"))
        if self.flip:
            feats = feats[:, rng.integers(feats.shape[1])]
        labels = np.load(os.path.join(ldir, f"{idx}.npy"))
        return {"tokens": feats, "label": labels}


def _collect_jsonl_rows(lst_dir: str, suffix: str = ".jsonl"):
    rows = []
    for name in sorted(os.listdir(lst_dir)):
        if not name.endswith(suffix):
            continue
        fp = os.path.join(lst_dir, name)
        code_dir = name.split(".")[0]
        with open(fp) as f:
            for line_idx, line in enumerate(f):
                rows.append((json.loads(line)["image_path"], code_dir,
                             line_idx))
    return rows


@dataclasses.dataclass
class Text2ImgImageSource:
    """t2i_image: jsonl manifests -> (image, code_dir, line_idx)
    (reference ``dataset/t2i.py:10-48`` Text2ImgDatasetImg)."""

    lst_dir: str
    face_lst_dir: Optional[str] = None
    image_size: int = 256
    train: bool = True

    def __post_init__(self):
        self.rows = _collect_jsonl_rows(self.lst_dir)
        if self.face_lst_dir is not None:
            self.rows += _collect_jsonl_rows(self.face_lst_dir,
                                             suffix="_face.jsonl")

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, idx: int):
        path, code_dir, line_idx = self.rows[idx]
        x = _load_image_record(path, self.image_size, self.train, idx)
        return {"image": x, "code_dir": code_dir,
                "code_name": np.int32(line_idx)}


@dataclasses.dataclass
class Text2ImgSource:
    """t2i: image + padded T5 text features + causal attn mask + valid flag
    (reference ``dataset/t2i.py:51-133`` Text2ImgDataset). Bad/too-small
    images and missing feature files yield the zero dummy record with
    valid=0, exactly as upstream."""

    data_path: str
    t5_feat_path: str
    short_t5_feat_path: Optional[str] = None
    image_size: int = 256
    downsample_size: int = 16
    train: bool = True
    t5_feature_max_len: int = 120
    t5_feature_dim: int = 2048

    def __post_init__(self):
        self.rows = _collect_jsonl_rows(self.data_path)
        self.code_len = (self.image_size // self.downsample_size) ** 2
        self.max_seq_length = self.t5_feature_max_len + self.code_len

    def __len__(self):
        return len(self.rows)

    def _dummy(self):
        s = self.max_seq_length
        return {
            "image": np.zeros((self.image_size, self.image_size, 3),
                              np.float32),
            "t5_feat": np.zeros((self.t5_feature_max_len,
                                 self.t5_feature_dim), np.float32),
            "attn_mask": np.tril(np.ones((s, s), bool)),
            "valid": np.int32(0),
        }

    def __getitem__(self, idx: int):
        path, code_dir, code_name = self.rows[idx]
        try:
            img = Image.open(path).convert("RGB")
        except Exception:
            return self._dummy()
        if min(img.size) < self.image_size:
            return self._dummy()
        rng = np.random.default_rng((hash(path) ^ idx) & 0x7FFFFFFF)
        from imagefolder_tpu.data._native import crop_flip_normalize

        if self.train:
            arr, oy, ox = _random_crop_plan(img, self.image_size, rng)
            x = crop_flip_normalize(arr, oy, ox, self.image_size,
                                    bool(rng.random() < 0.5))
        else:
            arr = center_crop_arr(img, self.image_size)
            x = crop_flip_normalize(np.ascontiguousarray(arr), 0, 0,
                                    self.image_size, False)

        t5_file = os.path.join(self.t5_feat_path, code_dir,
                               f"{code_name}.npy")
        # 30% short-caption feature swap (t2i.py:111-112)
        if self.short_t5_feat_path is not None and rng.random() < 0.3:
            t5_file = t5_file.replace(
                os.path.basename(os.path.normpath(self.t5_feat_path)),
                os.path.basename(os.path.normpath(self.short_t5_feat_path)))
        if not os.path.isfile(t5_file):
            return self._dummy()
        try:
            t5_feat = np.load(t5_file)[0]  # (len, dim)
        except Exception:
            return self._dummy()
        T, S = self.t5_feature_max_len, self.max_seq_length
        feat_len = min(T, t5_feat.shape[0])
        pad = np.zeros((T, self.t5_feature_dim), np.float32)
        pad[-feat_len:] = t5_feat[:feat_len]
        emb_mask = np.zeros((T,), np.float32)
        emb_mask[-feat_len:] = 1
        # left-padded text: causal mask with padded-text columns removed,
        # diagonal forced on (t2i.py:114-121)
        attn = np.tril(np.ones((S, S), np.float32))
        attn[:, :T] *= emb_mask[None, :]
        eye = np.eye(S, dtype=np.float32)
        attn = attn * (1 - eye) + eye
        return {"image": x, "t5_feat": pad, "attn_mask": attn.astype(bool),
                "valid": np.int32(1)}


def build_dataset(name: str, **kwargs):
    """Source registry (reference ``dataset/build.py:8-40``)."""
    if name == "imagenet":
        files, labels, _ = list_image_folder(kwargs.pop("data_path"))
        return ImageFolderSource(files, labels, **kwargs)
    if name == "imagenet_code":
        code_path = kwargs.pop("code_path")
        image_size = kwargs.pop("image_size", 256)
        return CodeSource(f"{code_path}/imagenet{image_size}_codes",
                          f"{code_path}/imagenet{image_size}_labels",
                          **kwargs)
    if name == "coco":
        return SingleFolderSource(kwargs.pop("data_path"), **kwargs)
    if name == "openimage":
        return JsonPathsSource(kwargs.pop("data_path"), **kwargs)
    if name == "pexels":  # class-folder tree, like imagenet (pexels.py:3-4)
        files, labels, _ = list_image_folder(kwargs.pop("data_path"))
        return ImageFolderSource(files, labels, **kwargs)
    if name == "t2i_image":
        return Text2ImgImageSource(**kwargs)
    if name == "t2i":
        return Text2ImgSource(**kwargs)
    raise ValueError(f"dataset {name} is not supported")


def make_loader(source, batch_size: int, *, train: bool = True, seed: int = 0,
                num_workers: int = 8, num_epochs: Optional[int] = None,
                shard_index: int = 0, shard_count: int = 1,
                drop_remainder: bool = True):
    """grain DataLoader over any registry source (same pipeline contract as
    ``make_dataloader``)."""
    import grain.python as grain

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
        data_source=source,
        sampler=sampler,
        operations=[grain.Batch(batch_size, drop_remainder=drop_remainder)],
        worker_count=num_workers,
    )
