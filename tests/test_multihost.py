"""Two-process jax.distributed smoke test on CPU (VERDICT r1 item 5).

Launches two real processes that initialize a shared jax.distributed
runtime over localhost, assemble a global 'data' mesh from per-host CPU
devices, and verify global-batch gradient semantics + process_allgather —
the contract every multi-host CLI path (train_tokenizer/var/rar, sample_*,
pretokenize) relies on. Reference equivalent: torchrun DDP bootstrap,
utils/distributed.py:20-57.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(900)
def test_two_process_cpu_smoke(tmp_path):
    worker = Path(__file__).parent / "_multihost_worker.py"
    coordinator = f"localhost:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_PROCESSES",
                        "JAX_PROCESS_ID", "JAX_COORDINATOR_ADDRESS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coordinator, "2", str(rank),
             str(tmp_path / "ckpt")],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for rank in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=840)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"OK rank={rank}" in out, out


def test_init_distributed_is_explicit_opt_in():
    """No coordinator (flag or env) -> single-process no-op, even when
    TPU-pod-looking variables are present (axon exports them on tunneled
    single-chip setups; bare jax.distributed.initialize raises there)."""
    from imagefolder_tpu.parallel.mesh import init_distributed

    stash = {k: os.environ.pop(k, None)
             for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS")}
    os.environ["TPU_WORKER_HOSTNAMES"] = "host0,host1"
    try:
        assert init_distributed() is False
    finally:
        os.environ.pop("TPU_WORKER_HOSTNAMES", None)
        for k, v in stash.items():
            if v is not None:
                os.environ[k] = v
