"""Test harness: run everything on a virtual 8-device CPU mesh.

The driver benches on a real TPU chip; tests validate numerics + sharding on
host CPU (XLA_FLAGS=--xla_force_host_platform_device_count=8), mirroring the
reference's no-cluster degradation paths (reference dist.py:25-29)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep matmuls deterministic/full precision on CPU for golden tests.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
