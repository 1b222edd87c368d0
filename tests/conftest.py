"""Test config: force the CPU backend with 8 virtual devices.

The driver environment pins JAX_PLATFORMS=axon (one real TPU chip); tests run
on CPU so they are hermetic, and multi-chip sharding tests get an 8-device
virtual mesh (SURVEY.md §4 item 4)."""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    # cap codegen to a generic AVX2 target: compiled-program caches stay
    # loadable across hosts (round-2 lesson: AOT entries compiled with
    # host-specific machine features refuse to load elsewhere)
    + " --xla_cpu_max_isa=AVX2"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# compile speed over runtime: tests run tiny shapes on a 1-core host where
# XLA compilation, not execution, is the wall-clock
jax.config.update("jax_exec_time_optimization_effort", -1.0)
jax.config.update("jax_memory_fitting_effort", -1.0)
# Cache compiled programs across test runs (big field/EC graphs are
# compile-heavy; runtime is trivial at test sizes).
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("ZKODST_TEST_CACHE") or
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

# This host has a single CPU core; XLA compiles of the big (k=17) graphs
# take tens of minutes there. Tests marked `slow` are skipped by default
# and run on the TPU backend via scripts/ (set RUN_SLOW=1 to include them).


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: heavy-compile test (TPU-run)")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow (set RUN_SLOW=1); covered by "
                                   "scripts/ on the TPU backend")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
