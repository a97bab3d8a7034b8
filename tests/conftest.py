"""Test configuration: run all tests on a virtual 8-device CPU mesh with x64 enabled.

Multi-chip sharding paths are validated on `--xla_force_host_platform_device_count=8`
(SURVEY.md §4(e): the reference has no distributed tests; a virtual CPU mesh is our fake
cluster). x64 gives solver parity tests IPOPT-grade arithmetic; library code remains
dtype-agnostic and runs f32 on real TPU.

Note: this environment's sitecustomize force-registers a remote TPU backend and resets
JAX_PLATFORMS, so the platform must be switched via jax.config AFTER import — env vars
alone are ignored.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache: repeated suite runs skip the (minutes of) XLA compiles
# (HILO_JAX_CACHE overrides the location — point it at an empty dir to measure
# the cold-compile wall time)
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("HILO_JAX_CACHE", "/tmp/hilo_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
