"""Worker for the 2-process jax.distributed smoke test (test_multihost.py).

Run as: python tests/_multihost_worker.py <coordinator> <num_procs> <rank>
Each process owns 2 virtual CPU devices; together they form one 4-device
'data' mesh. Verifies the multi-host contract the CLIs rely on:
init_distributed -> make_mesh over global devices -> shard_batch assembling
per-host loader shards -> a jitted global-batch reduction whose value every
host agrees on (the reference's DDP allreduce semantics, dist.py:20-49).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2")

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

    sync_global_devices("done")
    print(f"OK rank={rank}")


if __name__ == "__main__":
    main()
