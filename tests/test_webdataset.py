"""Webdataset reader parity: resampled-infinite mode, text-label mode,
json res-ratio pre-filter, shuffle buffer, and the ``with_epoch`` worker
math — golden-tested against the reference ``data/webdataset_reader.py``
(imported with recording stubs for the wds/torchvision dependencies)."""

import io
import itertools
import sys
import tarfile
import types
from pathlib import Path

import numpy as np
import pytest

from tests.ref_utils import make_stub, ref_path

ref_path()

from imagefolder_tpu.data.webdataset import (  # noqa: E402
    SimpleImageDataset,
    WebDatasetReader,
    res_ratio_ok,
    with_epoch_counts,
)


# --------------------------------------------------------------------------
# reference import with recording stubs (webdataset/torchvision are not
# installed offline; the stubs only OBSERVE — every number under test is
# computed by the reference's own lines)
# --------------------------------------------------------------------------

def _import_reference_reader():
    if "data.webdataset_reader" in sys.modules:
        return sys.modules["data.webdataset_reader"]

    def _passthrough(*a, **k):
        return ("op", a, k)

    wds = make_stub("webdataset")
    for name in ("decode", "rename", "map", "map_dict", "select", "shuffle",
                 "batched", "ResampledShards", "SimpleShardList",
                 "tarfile_to_samples"):
        setattr(wds, name, _passthrough)
    wds.split_by_worker = object()
    wds.warn_and_continue = object()
    wds.ignore_and_continue = object()
    wds.autodecode = types.SimpleNamespace(ImageHandler=_passthrough)

    class DataPipeline:
        def __init__(self, *ops):
            self.ops = ops
            self.epoch_arg = None

        def with_epoch(self, n):
            self.epoch_arg = n
            return self

    class WebLoader:
        def __init__(self, dataset, **kw):
            self.dataset = dataset
            self.kw = kw

    wds.DataPipeline = DataPipeline
    wds.WebLoader = WebLoader
    sys.modules["webdataset"] = wds

    tv = make_stub("torchvision")
    tr = make_stub("torchvision.transforms")
    for name in ("Resize", "RandomCrop", "CenterCrop",
                 "RandomHorizontalFlip", "ToTensor", "Normalize", "Compose"):
        setattr(tr, name, _passthrough)
    tr.InterpolationMode = types.SimpleNamespace(BICUBIC="bicubic")
    tv.transforms = tr
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tr)

    import data.webdataset_reader as ref_reader
    return ref_reader


def test_with_epoch_math_matches_reference():
    """num_worker_batches / num_batches / num_samples vs the reference's
    SimpleImageDataset accounting (webdataset_reader.py:198-216) across
    divisible, ragged and tiny configurations."""
    ref_reader = _import_reference_reader()
    cases = [
        (1_281_167, 32, 256, 12),   # imagenet, 8 gpus
        (1_281_167, 64, 2048, 4),   # the RAR recipe shape
        (1000, 8, 64, 3),           # ragged
        (7, 2, 2, 2),               # tiny, rounds up hard
        (4096, 16, 128, 1),         # exactly divisible
    ]
    for n, per_gpu, global_bs, workers in cases:
        ref = ref_reader.SimpleImageDataset(
            train_shards_path="train-{000000..000003}.tar",
            eval_shards_path="eval-{000000..000001}.tar",
            num_train_examples=n, per_gpu_batch_size=per_gpu,
            global_batch_size=global_bs, num_workers_per_gpu=workers)
        nwb, nb, ns = with_epoch_counts(n, global_bs, workers)
        assert nb == ref._train_dataloader.num_batches, (n, global_bs, workers)
        assert ns == ref._train_dataloader.num_samples
        assert nwb == ref._train_dataset.epoch_arg  # the with_epoch cut


def test_res_ratio_filter_matches_reference():
    ref_reader = _import_reference_reader()
    ref_f = ref_reader.filter_by_res_ratio()  # defaults 256 / 0.5 / 2.0
    rng = np.random.default_rng(0)
    metas = [{"original_height": int(h), "original_width": int(w)}
             for h, w in rng.integers(32, 1024, size=(200, 2))]
    metas += [  # boundary cases
        {"original_height": 256, "original_width": 256},
        {"original_height": 128, "original_width": 256},
        {"original_height": 512, "original_width": 256},
        {"original_height": 513, "original_width": 256},
        {"original_height": 255, "original_width": 255},
        {"original_height": 256, "original_width": 512},
    ]
    for meta in metas:
        assert res_ratio_ok(meta) == ref_f({"json": meta}), meta


# --------------------------------------------------------------------------
# functional coverage of the new reader modes
# --------------------------------------------------------------------------

def _write_shard(path: Path, samples):
    """samples: list of dicts with 'img' (HxWx3 uint8) and optional
    'cls'/'txt'/'json' members."""
    from PIL import Image

    with tarfile.open(path, "w") as tf:
        for i, s in enumerate(samples):
            key = f"{i:05d}"

            def add(ext, payload):
                info = tarfile.TarInfo(f"{key}.{ext}")
                info.size = len(payload)
                tf.addfile(info, io.BytesIO(payload))

            buf = io.BytesIO()
            Image.fromarray(s["img"]).save(buf, format="PNG")
            add("png", buf.getvalue())
            if "cls" in s:
                add("cls", str(s["cls"]).encode())
            if "txt" in s:
                add("txt", s["txt"].encode())
            if "json" in s:
                import json as _json

                add("json", _json.dumps(s["json"]).encode())


def _rand_img(rng, h=40, w=40):
    return (rng.random((h, w, 3)) * 255).astype(np.uint8)


def test_resampled_infinite_stream(tmp_path):
    rng = np.random.default_rng(0)
    for si in range(2):
        _write_shard(tmp_path / f"s-{si:03d}.tar",
                     [{"img": _rand_img(rng), "cls": si * 3 + i}
                      for i in range(3)])
    pool = 6
    reader = WebDatasetReader(str(tmp_path / "s-{000..001}.tar"),
                              image_size=32, train=True, resampled=True,
                              shuffle_buffer=8, shuffle_initial=4)
    got = list(itertools.islice(iter(reader), pool * 4))
    assert len(got) == pool * 4  # strictly larger than the finite pool
    labels = {int(s["label"]) for s in got}
    assert labels <= set(range(6)) and len(labels) >= 4

    # per-worker streams decorrelate (seed offset by shard_index)
    r2 = WebDatasetReader(str(tmp_path / "s-{000..001}.tar"), image_size=32,
                          train=True, resampled=True, shard_index=1)
    a = [int(s["label"]) for s in itertools.islice(iter(reader), 12)]
    b = [int(s["label"]) for s in itertools.islice(iter(r2), 12)]
    assert a != b

    # with_epoch cut bounds the infinite stream at num_batches
    batches = list(reader.batches(4, num_batches=5))
    assert len(batches) == 5 and batches[0]["image"].shape == (4, 32, 32, 3)


def test_text_label_mode_and_res_filter(tmp_path):
    rng = np.random.default_rng(1)
    samples = [
        {"img": _rand_img(rng, 300, 300), "txt": "a red square",
         "json": {"original_height": 300, "original_width": 300}},
        {"img": _rand_img(rng, 300, 300), "txt": "too small",
         "json": {"original_height": 100, "original_width": 100}},
        {"img": _rand_img(rng, 300, 300), "txt": "bad ratio",
         "json": {"original_height": 900, "original_width": 300}},
        {"img": _rand_img(rng, 300, 300), "txt": "no metadata"},
    ]
    _write_shard(tmp_path / "t-000.tar", samples)
    reader = WebDatasetReader(str(tmp_path / "t-000.tar"), image_size=64,
                              train=False, mode="text",
                              res_ratio_filtering=True)
    got = list(reader)
    assert [s["text"] for s in got] == ["a red square"]
    assert got[0]["__key__"] == "00000"
    assert got[0]["image"].shape == (64, 64, 3)

    # without filtering all four flow through, text surfaces verbatim
    reader = WebDatasetReader(str(tmp_path / "t-000.tar"), image_size=64,
                              train=False, mode="text")
    texts = [s["text"] for s in reader]
    assert texts == ["a red square", "too small", "bad ratio", "no metadata"]

    # collation keeps texts as a list next to the image batch
    b = next(reader.batches(4, partial=True))
    assert b["image"].shape == (4, 64, 64, 3) and len(b["text"]) == 4


def test_shuffle_buffer_preserves_multiset(tmp_path):
    rng = np.random.default_rng(2)
    _write_shard(tmp_path / "p-000.tar",
                 [{"img": _rand_img(rng), "cls": i} for i in range(12)])
    plain = [int(s["label"]) for s in WebDatasetReader(
        str(tmp_path / "p-000.tar"), image_size=32, train=False)]
    mixed = [int(s["label"]) for s in WebDatasetReader(
        str(tmp_path / "p-000.tar"), image_size=32, train=False,
        shuffle_buffer=6, shuffle_initial=3, seed=5)]
    assert sorted(mixed) == sorted(plain) == list(range(12))
    assert mixed != plain  # actually shuffled


def test_partial_batches_eval_semantics(tmp_path):
    rng = np.random.default_rng(3)
    _write_shard(tmp_path / "q-000.tar",
                 [{"img": _rand_img(rng), "cls": i} for i in range(5)])
    reader = WebDatasetReader(str(tmp_path / "q-000.tar"), image_size=32,
                              train=False)
    full = list(reader.batches(2, partial=False))
    assert [b["image"].shape[0] for b in full] == [2, 2]
    part = list(reader.batches(2, partial=True))
    assert [b["image"].shape[0] for b in part] == [2, 2, 1]


def test_simple_image_dataset_facade(tmp_path):
    rng = np.random.default_rng(4)
    for si in range(2):
        _write_shard(tmp_path / f"f-{si:03d}.tar",
                     [{"img": _rand_img(rng), "cls": i} for i in range(4)])
    pat = str(tmp_path / "f-{000..001}.tar")
    ds = SimpleImageDataset(pat, pat, num_train_examples=8,
                            per_device_batch_size=2, global_batch_size=4,
                            num_workers_per_device=2, crop_size=32)
    nwb, nb, ns = with_epoch_counts(8, 4, 2)
    assert (ds.num_worker_batches, ds.num_batches, ds.num_samples) == (
        nwb, nb, ns)
    train = list(ds.train_dataloader())
    assert len(train) == ds.num_worker_batches
    assert train[0]["image"].shape == (2, 32, 32, 3)
    ev = list(ds.eval_dataloader())  # this worker's split: 1 of 2 shards
    assert sum(b["image"].shape[0] for b in ev) == 4

    with pytest.raises(NotImplementedError):
        SimpleImageDataset(pat, pat, 8, 2, 4,
                           dataset_with_class_label=False)
