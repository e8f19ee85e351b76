"""End-to-end integration: synthetic dataset -> loader -> GAN train steps ->
orbax checkpoint round-trip -> reconstruction eval. Mirrors the CLI flow
(scripts/train_tokenizer.py) without the process boundary."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("tinyds")
    rng = np.random.default_rng(0)
    for c in range(2):
        d = root / "train" / f"class_{c}"
        d.mkdir(parents=True)
        for i in range(6):
            Image.fromarray((rng.random((48, 40, 3)) * 255).astype(np.uint8)
                            ).save(d / f"{i}.jpg")
    return root


def test_loader_train_ckpt_eval_roundtrip(tiny_dataset, tmp_path):
    from imagefolder_tpu.data.imagenet import make_dataloader
    from imagefolder_tpu.eval.psnr_ssim import psnr
    from imagefolder_tpu.models.tokenizer import ModelArgs, VQModel
    from imagefolder_tpu.train.tokenizer_train import (
        TokenizerTrainConfig,
        TokenizerTrainer,
    )
    from imagefolder_tpu.utils.ckpt import CheckpointManager

    margs = ModelArgs(
        codebook_size=16, codebook_embed_dim=8,
        encoder_ch_mult=(1, 2), decoder_ch_mult=(1, 2), z_channels=32,
        enc_type="cnn", dec_type="cnn", semantic_guide="none",
        detail_guide="none", num_latent_tokens=256, image_size=32,
        v_patch_nums=(1, 16), start_drop=1,
    )
    tcfg = TokenizerTrainConfig(disc_type="patchgan", epochs=1,
                                steps_per_epoch=3, image_size=32)
    trainer = TokenizerTrainer(margs, tcfg)

    loader = make_dataloader(str(tiny_dataset / "train"), 4, 32, train=True,
                             num_epochs=2, num_workers=0)
    it = iter(loader)
    b = next(it)
    assert b["image"].shape == (4, 32, 32, 3)
    assert b["image"].min() >= -1.0 and b["image"].max() <= 1.0

    key = jax.random.PRNGKey(0)
    state = trainer.init(key, jnp.asarray(b["image"][:2]))
    losses = []
    for step in range(3):
        imgs = jnp.asarray(next(it)["image"]) if step else jnp.asarray(b["image"])
        state, metrics = trainer.train_step(state, imgs,
                                            jax.random.fold_in(key, step),
                                            epoch=0)
        losses.append(float(metrics["rec_loss"]))
    assert all(np.isfinite(losses))

    # checkpoint round-trip (reference last_ckpt/resume semantics)
    ckpt = CheckpointManager(str(tmp_path / "run"))
    ckpt.save(3, jax.device_get(state))
    ckpt.wait()
    restored, step = ckpt.restore(jax.device_get(state))
    assert step == 3
    same = jax.tree.map(lambda a, b: bool(np.allclose(a, b)),
                        jax.device_get(state).params, restored.params)
    assert all(jax.tree.leaves(same))

    # eval path on restored params
    model = VQModel(margs)
    rec = model.apply({"params": restored.params}, jnp.asarray(b["image"]),
                      method=VQModel.img_to_reconstructed_img)
    p = psnr(jnp.asarray(b["image"]) * 0.5 + 0.5, rec * 0.5 + 0.5)
    assert np.isfinite(np.asarray(p)).all()


def test_data_order_resume_mid_epoch(tiny_dataset, tmp_path):
    """Kill/resume mid-epoch reproduces the unbroken batch stream (VERDICT
    r1 item 9; reference DistInfiniteBatchSampler.start_ep/start_it,
    utils/data_sampler.py:67-103). Prefetch-ahead must not skip batches."""
    from imagefolder_tpu.data.imagenet import device_prefetch, make_dataloader
    from imagefolder_tpu.utils.ckpt import CheckpointManager

    def fresh_loader():
        return make_dataloader(str(tiny_dataset / "train"), 2, 32,
                               train=True, seed=7, num_epochs=4,
                               num_workers=0)

    # uninterrupted run: 10 batches
    ref = [np.asarray(b["image"])
           for _, b in zip(range(10), device_prefetch(iter(fresh_loader())))]

    # interrupted run: consume 4 batches (prefetcher has pulled ahead),
    # checkpoint the data state, "crash"
    ckpt = CheckpointManager(str(tmp_path / "run"))
    it = device_prefetch(iter(fresh_loader()))
    got = [np.asarray(next(it)["image"]) for _ in range(4)]
    ckpt.save_data_state(4, it.state)

    # resume in a new process-equivalent: new loader, restore state
    raw = iter(fresh_loader())
    blob = ckpt.restore_data_state(4)
    assert blob is not None
    raw.set_state(blob)
    it2 = device_prefetch(raw)
    got += [np.asarray(next(it2)["image"]) for _ in range(6)]

    assert len(got) == len(ref)
    for i, (a, b) in enumerate(zip(got, ref)):
        np.testing.assert_array_equal(a, b, err_msg=f"batch {i} diverged")

    # stale/mismatched step falls back to a fresh stream
    assert ckpt.restore_data_state(5) is None


def test_jsonl_batches_resume():
    """RAR pretokenized stream: exact (epoch, cursor) resume across the
    epoch boundary."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from scripts.train_rar import JsonlTokens

    rows = [{"tokens": [i, i + 1], "class_id": i % 3} for i in range(11)]
    data = JsonlTokens.__new__(JsonlTokens)
    data.rows = rows

    ref_it = data.batches(2, seed=3)
    ref = [ref_it.__next__() for _ in range(12)]  # crosses epoch boundary

    it = data.batches(2, seed=3)
    got = [next(it) for _ in range(7)]
    blob = it.get_state()
    it2 = data.batches(2, seed=3)
    it2.set_state(blob)
    got += [next(it2) for _ in range(5)]
    for (at, al), (bt, bl) in zip(got, ref):
        np.testing.assert_array_equal(at, bt)
        np.testing.assert_array_equal(al, bl)

    # sharded slices partition the permutation per epoch
    s0 = data.batches(2, seed=3, shard_index=0, shard_count=2)
    s1 = data.batches(2, seed=3, shard_index=1, shard_count=2)
    t0, _ = next(s0)
    t1, _ = next(s1)
    assert not np.array_equal(t0, t1)


def test_ckpt_aux_and_incompatible_data_state(tmp_path):
    """aux_state (VAR progressive counters) roundtrips by step, and a loader
    blob whose pipeline identity no longer matches falls back to a fresh
    stream instead of aborting the resumed run."""
    from imagefolder_tpu.utils.ckpt import CheckpointManager

    ckpt = CheckpointManager(str(tmp_path / "c"))
    prog = {"prog_it": 7, "last_prog_si": 5, "first_prog": False}
    ckpt.save_aux(100, {"prog": prog})
    assert ckpt.restore_aux(100) == {"prog": prog}
    assert ckpt.restore_aux(99) is None  # wrong step -> fresh defaults

    class Incompatible:
        def set_state(self, blob):
            raise ValueError("DataSource in checkpoint does not match")

    class Ok:
        def set_state(self, blob):
            self.blob = blob

    assert ckpt.apply_data_state(5, Ok()) is False  # nothing saved
    ckpt.save_data_state(5, b"xyz")
    msgs = []
    assert ckpt.apply_data_state(5, Incompatible(), log=msgs.append) is False
    assert "incompatible" in msgs[0]
    ok = Ok()
    assert ckpt.apply_data_state(5, ok) is True and ok.blob == b"xyz"
