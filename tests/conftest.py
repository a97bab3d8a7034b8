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


# -- worker-crash rerun -------------------------------------------------------
# Root-caused environmental flake (this jax 0.9.0 + XLA:CPU image): writing a
# persistent-cache entry calls executable.serialize(), which internally AOT
# re-compiles the executable (that is where the `+prefer-no-scatter` target
# features in the cpu_aot_loader warnings come from); on COLD-cache full-suite
# runs this abort()s the process once in a while (observed 2 of 4 cold runs,
# faulthandler stack: compilation_cache.put_executable_and_time ->
# executable.serialize(), SIGABRT with no CHECK message; never reproducible
# standalone, never on warm caches — warm runs perform no cache writes). The
# crash takes the whole xdist worker down and its in-flight test would be
# reported as a spurious failure. Reschedule such tests (bounded) on the
# surviving workers instead: the recompile lands warm on retry, so the retry
# is deterministic.
_CRASH_RERUNS: dict = {}
_MAX_CRASH_RERUNS = 2


def pytest_handlecrashitem(crashitem, report, sched):
    n = _CRASH_RERUNS.get(crashitem, 0)
    if n < _MAX_CRASH_RERUNS:
        _CRASH_RERUNS[crashitem] = n + 1
        sched.mark_test_pending(crashitem)
        report.outcome = "rerun"


def pytest_report_teststatus(report, config):
    if report.outcome == "rerun":
        return "rerun", "R", ("RERUN", {"yellow": True})
