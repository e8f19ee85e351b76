"""Test harness: run everything on a virtual 8-device CPU mesh.

The driver benches on a real TPU chip; tests validate numerics + sharding on
host CPU (XLA_FLAGS=--xla_force_host_platform_device_count=8), mirroring the
reference's no-cluster degradation paths (reference dist.py:25-29)."""

import os

# Force CPU: the ambient environment sets JAX_PLATFORMS=axon (tunneled TPU),
# where every eager op is an RPC round trip — tests would run ~100x slower
# and fight the bench for the single chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep matmuls deterministic/full precision on CPU for golden tests.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax  # noqa: E402

# The axon sitecustomize sets jax_platforms="axon,cpu" programmatically,
# overriding the env var — force CPU via config update after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: repeat suite runs skip XLA recompiles.
# Keyed by host CPU identity: XLA:CPU AOT results baked for another
# machine's vector extensions abort with SIGILL when loaded (observed when
# /tmp survives a host change), and the cache key does not cover this.
import platform  # noqa: E402


def _cpu_tag():
    try:
        import hashlib

        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags")):
                    return hashlib.md5(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    return platform.machine()


jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/imagefolder_tpu_jax_cache_{_cpu_tag()}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
