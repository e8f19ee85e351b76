"""MaskGIT generator, webdataset reader, viz utils, class table."""

import io
import tarfile

import jax
import jax.numpy as jnp
import numpy as np

from imagefolder_tpu.data.classes import imagenet_idx2classname
from imagefolder_tpu.data.webdataset import WebDatasetReader, expand_shard_urls
from imagefolder_tpu.models.maskgit import (
    MaskGIT,
    MaskGITConfig,
    mask_input_tokens,
    maskgit_generate,
    mlm_loss,
)
from imagefolder_tpu.utils.viz import generation_grid, recon_grid


def test_maskgit_train_and_generate():
    cfg = MaskGITConfig(embed_dim=64, depth=2, num_heads=2, image_seq_len=16,
                        codebook_size=32, condition_num_classes=10)
    m = MaskGIT(cfg)
    key = jax.random.PRNGKey(0)
    toks = jax.random.randint(key, (2, 16), 0, 32)
    cond = jnp.asarray([1, 5])
    params = m.init({"params": key}, toks, cond)["params"]
    masked, masks = mask_input_tokens(toks, key, cfg.mask_token_id)
    assert bool(masks.any()) and masked.shape == toks.shape
    logits = m.apply({"params": params}, masked, cond, rng=key)
    assert logits.shape == (2, 16, 32)
    loss, acc = mlm_loss(logits, toks, masks)
    assert np.isfinite(float(loss))
    for decay in ("constant", "linear", "power-cosine"):
        ids = maskgit_generate(m, params, cond, key, guidance_decay=decay,
                               num_sample_steps=4)
        assert ids.shape == (2, 16)
        assert int(ids.max()) < 32 and int(ids.min()) >= 0


def test_webdataset_reader(tmp_path):
    # build two tiny shards
    from PIL import Image

    for si in range(2):
        with tarfile.open(tmp_path / f"shard-{si:03d}.tar", "w") as tf:
            for i in range(3):
                img = Image.fromarray(
                    (np.random.default_rng(i).random((40, 40, 3)) * 255
                     ).astype(np.uint8))
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                data = buf.getvalue()
                info = tarfile.TarInfo(f"{si}_{i:05d}.png")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
                cls = str(i).encode()
                info = tarfile.TarInfo(f"{si}_{i:05d}.cls")
                info.size = len(cls)
                tf.addfile(info, io.BytesIO(cls))

    urls = expand_shard_urls(str(tmp_path / "shard-{000..001}.tar"))
    assert len(urls) == 2
    reader = WebDatasetReader(str(tmp_path / "shard-{000..001}.tar"),
                              image_size=32, train=True)
    samples = list(reader)
    assert len(samples) == 6
    assert samples[0]["image"].shape == (32, 32, 3)
    assert set(int(s["label"]) for s in samples) == {0, 1, 2}
    batches = list(WebDatasetReader(str(tmp_path / "shard-{000..001}.tar"),
                                    image_size=32, train=False).batches(2))
    assert batches[0]["image"].shape == (2, 32, 32, 3)


def test_viz_and_classes():
    x = np.random.default_rng(0).uniform(-1, 1, (4, 8, 8, 3)).astype(np.float32)
    r = x + 0.1
    g = recon_grid(x, r, max_items=2)
    assert g.shape == (2 * 8, 3 * 8, 3) and g.dtype == np.uint8
    gg = generation_grid(x, ncol=2)
    assert gg.shape == (2 * 8, 2 * 8, 3)
    names = imagenet_idx2classname()
    assert len(names) == 1000 and isinstance(names[0], str)


def test_convert_to_wds_roundtrip(tmp_path):
    """Folder -> tar shards -> WebDatasetReader roundtrip (reference
    convert_imagenet_to_wds.py shard layout: <key>.jpg + <key>.cls)."""
    import sys
    from pathlib import Path

    import numpy as np
    from PIL import Image

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from scripts.convert_to_wds import write_shards

    rng = np.random.default_rng(0)
    for c in range(2):
        d = tmp_path / "train" / f"class_{c}"
        d.mkdir(parents=True)
        for i in range(4):
            Image.fromarray((rng.random((40, 40, 3)) * 255).astype(np.uint8)
                            ).save(d / f"{i}.jpg")
    n, shards = write_shards(str(tmp_path / "train"), str(tmp_path / "wds"),
                             "toy", samples_per_shard=3)
    assert (n, shards) == (8, 3)

    from imagefolder_tpu.data.webdataset import WebDatasetReader

    reader = WebDatasetReader(
        str(tmp_path / "wds" / "toy-{000000..000002}.tar"),
        image_size=32, train=False)
    samples = [s for _, s in zip(range(8), iter(reader))]
    assert len(samples) == 8
    labels = sorted({int(s["label"]) for s in samples})
    assert labels == [0, 1]
    assert samples[0]["image"].shape == (32, 32, 3)
