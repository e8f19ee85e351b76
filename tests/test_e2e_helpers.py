"""e2e_pipeline helper invariants (no device work).

The pipeline's sample grading assumes the sample CLIs emit images in
``np.tile(np.arange(num_classes), ...)`` label order (sample_var.py:68,
sample_rar.py:77); these tests lock the grader to that contract.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.e2e_pipeline import grade_samples, make_dataset, save_grid


def _dataset(tmp_path, classes=4, per_class=3, size=32):
    root = tmp_path / "ds"
    make_dataset(root, classes, per_class, size)
    return root


def test_make_dataset_layout(tmp_path):
    root = _dataset(tmp_path)
    dirs = sorted(p.name for p in root.iterdir())
    assert dirs == [f"class_{c:02d}" for c in range(4)]
    files = sorted((root / "class_00").glob("*.png"))
    assert len(files) == 3
    from PIL import Image

    w, h = Image.open(files[0]).size
    assert (w, h) == (32, 32)


def test_grade_samples_perfect_memorization(tmp_path):
    from PIL import Image

    root = _dataset(tmp_path)
    classes, n = 4, 8
    # emit exact training images in the samplers' tile(arange) label order
    req = np.tile(np.arange(classes), -(-n // classes))[:n]
    imgs = []
    for c in req:
        f = sorted((root / f"class_{c:02d}").glob("*.png"))[0]
        imgs.append(np.asarray(Image.open(f), dtype=np.uint8))
    npz = tmp_path / "samples.npz"
    np.savez(npz, arr_0=np.stack(imgs))
    g = grade_samples(npz, root, classes, n)
    assert g["class_fidelity"] == 1.0
    assert g["mean_nn_rmse"] < 1e-6
    assert g["per_class_fidelity"] == [1.0] * classes


def test_grade_samples_detects_wrong_classes(tmp_path):
    from PIL import Image

    root = _dataset(tmp_path)
    classes, n = 4, 8
    req = np.tile(np.arange(classes), -(-n // classes))[:n]
    # emit images from the WRONG class (requested c, produced c+1)
    imgs = []
    for c in req:
        w = (c + 1) % classes
        f = sorted((root / f"class_{w:02d}").glob("*.png"))[0]
        imgs.append(np.asarray(Image.open(f), dtype=np.uint8))
    npz = tmp_path / "samples.npz"
    np.savez(npz, arr_0=np.stack(imgs))
    g = grade_samples(npz, root, classes, n)
    assert g["class_fidelity"] == 0.0


def test_save_grid(tmp_path):
    arr = np.random.default_rng(0).integers(
        0, 255, (5, 16, 16, 3), dtype=np.uint8)
    npz = tmp_path / "s.npz"
    np.savez(npz, arr_0=arr)
    out = tmp_path / "grid.png"
    save_grid(npz, out, cols=3)
    from PIL import Image

    w, h = Image.open(out).size
    assert (w, h) == (3 * 16, 2 * 16)
