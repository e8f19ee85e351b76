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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# This box exposes ONE core (nproc=1): the 8 virtual devices' collective
# calls rendezvous on borrowed threads, and under load XLA's default
# terminate timeout fires and *exits the process* ("Termination timeout for
# ... Exiting to ensure a consistent program state",
# xla/service/rendezvous.cc) — seen as load-dependent
# `Fatal Python error: Aborted` in the sharded train-step tests. Give the
# rendezvous effectively unlimited patience; correctness tests prefer slow
# over dead.
if "collective_call_terminate_timeout" not in flags:
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
              " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
              " --xla_cpu_collective_timeout_seconds=3600")
os.environ["XLA_FLAGS"] = flags
# Keep matmuls deterministic/full precision on CPU for golden tests.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax  # noqa: E402

# The axon sitecustomize sets jax_platforms="axon,cpu" programmatically,
# overriding the env var — force CPU via config update after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# NO persistent compilation cache for the CPU suite. Loading serialized
# XLA:CPU AOT executables is unsound here: the loader warns about machine-
# feature mismatches ("could lead to execution errors such as SIGILL") and
# full-suite runs reproducibly died with `Fatal Python error: Aborted`
# inside a cached sharded executable (tests/test_sharding.py) while the
# same test passes in isolation with fresh compiles. Concurrent pytest
# processes also share the directory. Recompiles are the safe price.
# Opt back in explicitly with IMGF_TEST_CACHE=/path if debugging locally.
import os as _os  # noqa: E402

if _os.environ.get("IMGF_TEST_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      _os.environ["IMGF_TEST_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
