"""Test env: force CPU JAX with 8 virtual devices (multi-chip sharding tests
run on a fake mesh, per the TPU-testing strategy in SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override any preset (e.g. axon/TPU)
# strip any pre-existing device-count flag, then force 8 (a leaked
# XLA_FLAGS from a prior job would otherwise shrink the test mesh)
_flags = " ".join(
    f for f in os.environ.get("XLA_FLAGS", "").split()
    if not f.startswith("--xla_force_host_platform_device_count")
)
os.environ["XLA_FLAGS"] = (
    _flags + " --xla_force_host_platform_device_count=8"
).strip()

# Some installed packages import jax before this conftest runs; the config
# route works as long as no backend has been initialized yet.
import jax

jax.config.update("jax_platforms", "cpu")
# CPU compiles dominate test runtime; persist them across pytest processes.
jax.config.update("jax_compilation_cache_dir", "/tmp/eop_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
