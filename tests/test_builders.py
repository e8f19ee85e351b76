"""Dataset registry (reference dataset/build.py): coco/openimage/pexels/
imagenet_code/t2i builders, incl. a golden test of the t2i attention-mask
construction against the reference Text2ImgDataset math."""

import json

import numpy as np
import pytest
from PIL import Image

from imagefolder_tpu.data import build_dataset, make_loader


@pytest.fixture(scope="module")
def flat_folder(tmp_path_factory):
    root = tmp_path_factory.mktemp("flat")
    rng = np.random.default_rng(0)
    for i in range(5):
        Image.fromarray((rng.random((40, 40, 3)) * 255).astype(np.uint8)
                        ).save(root / f"img{i}.png")
    return root


def test_coco_single_folder(flat_folder):
    src = build_dataset("coco", data_path=str(flat_folder), image_size=32)
    assert len(src) == 5
    rec = src[0]
    assert rec["image"].shape == (32, 32, 3)
    assert rec["label"] == 0
    batches = list(make_loader(src, 2, train=False, num_epochs=1,
                               num_workers=0, drop_remainder=True))
    assert batches[0]["image"].shape == (2, 32, 32, 3)


def test_openimage_json_manifest(flat_folder, tmp_path):
    (tmp_path / "imgs").mkdir()
    names = []
    rng = np.random.default_rng(1)
    for i in range(3):
        Image.fromarray((rng.random((36, 36, 3)) * 255).astype(np.uint8)
                        ).save(tmp_path / "imgs" / f"{i}.png")
        names.append(f"imgs/{i}.png")
    names.append("imgs/missing.png")  # exercises the bad-image retry
    (tmp_path / "image_paths.json").write_text(json.dumps(names))
    src = build_dataset("openimage", data_path=str(tmp_path), image_size=32)
    assert len(src) == 4
    assert src[3]["image"].shape == (32, 32, 3)  # retried into a neighbour

    with pytest.raises(FileNotFoundError):
        build_dataset("openimage", data_path=str(tmp_path / "imgs"))


def test_imagenet_code_source(tmp_path):
    fdir, ldir = tmp_path / "codes", tmp_path / "labels"
    fdir.mkdir(), ldir.mkdir()
    for i in range(4):
        np.save(fdir / f"{i}.npy", np.full((2, 16), i, np.int64))
        np.save(ldir / f"{i}.npy", np.asarray([i]))
    from imagefolder_tpu.data import CodeSource

    src = CodeSource(str(fdir), str(ldir))
    assert len(src) == 4
    rec = src[2]
    assert rec["tokens"].shape == (2, 16) and rec["tokens"][0, 0] == 2
    assert rec["label"][0] == 2


def _ref_t2i_mask(feat_len, T, S):
    """Reference construction, dataset/t2i.py:114-121 (numpy transcription
    of the torch ops for the golden)."""
    emb_mask = np.zeros((T,))
    emb_mask[-feat_len:] = 1
    attn_mask = np.tril(np.ones((S, S)))
    attn_mask[:, :T] = attn_mask[:, :T] * emb_mask[None, :]
    eye = np.eye(S, S)
    attn_mask = attn_mask * (1 - eye) + eye
    return attn_mask.astype(bool)


def test_t2i_jsonl(tmp_path):
    imgs = tmp_path / "imgs"
    lst = tmp_path / "lst"
    t5 = tmp_path / "t5"
    imgs.mkdir(), lst.mkdir(), (t5 / "part0").mkdir(parents=True)
    rng = np.random.default_rng(2)
    rows = []
    for i in range(3):
        p = imgs / f"{i}.png"
        Image.fromarray((rng.random((64, 64, 3)) * 255).astype(np.uint8)
                        ).save(p)
        rows.append({"image_path": str(p)})
    with open(lst / "part0.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    np.save(t5 / "part0" / "0.npy", rng.standard_normal((1, 7, 8)).astype(np.float32))
    np.save(t5 / "part0" / "1.npy", rng.standard_normal((1, 20, 8)).astype(np.float32))
    # row 2 has no feature file -> dummy

    src = build_dataset(
        "t2i", data_path=str(lst), t5_feat_path=str(t5),
        image_size=32, downsample_size=16, t5_feature_max_len=10,
        t5_feature_dim=8, train=False)
    S = 10 + (32 // 16) ** 2
    r0 = src[0]
    assert r0["valid"] == 1
    assert r0["t5_feat"].shape == (10, 8)
    assert np.all(r0["t5_feat"][:3] == 0)  # left-padded (7 real rows)
    np.testing.assert_array_equal(r0["attn_mask"], _ref_t2i_mask(7, 10, S))
    r1 = src[1]  # feature longer than max_len -> truncated to first 10
    np.testing.assert_array_equal(r1["attn_mask"], _ref_t2i_mask(10, 10, S))
    r2 = src[2]
    assert r2["valid"] == 0 and np.all(r2["image"] == 0)
    np.testing.assert_array_equal(r2["attn_mask"],
                                  np.tril(np.ones((S, S), bool)))

    # t2i_image variant
    src_img = build_dataset("t2i_image", lst_dir=str(lst), image_size=32,
                            train=False)
    rec = src_img[1]
    assert rec["image"].shape == (32, 32, 3)
    assert rec["code_dir"] == "part0" and rec["code_name"] == 1


def test_pexels_class_tree(tmp_path):
    for c in ("a", "b"):
        d = tmp_path / c
        d.mkdir()
        Image.fromarray(np.zeros((34, 34, 3), np.uint8)).save(d / "x.png")
    src = build_dataset("pexels", data_path=str(tmp_path), image_size=32,
                        train=False)
    assert len(src) == 2
    assert {int(src[i]["label"]) for i in range(2)} == {0, 1}

    with pytest.raises(ValueError):
        build_dataset("nope")
