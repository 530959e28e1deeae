"""Test configuration: CPU-only JAX with 8 virtual devices and float64.

Multi-chip sharding tests run on a simulated 8-device CPU mesh (the
TPU-native substitute for a fake distributed backend, SURVEY.md section 4);
float64 matches the reference's NumPy numerics for parity tests.
"""

import gc
import os

import pytest

# Hard-force CPU: the machine's axon TPU plugin (sitecustomize in
# /root/.axon_site) presets JAX_PLATFORMS=axon and registers itself at
# interpreter startup, so setdefault is not enough.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compile cache: warm reruns of the suite deserialize instead
# of recompiling (~2 min vs ~20).  Set GNN_TPU_TEST_CACHE=0 to force cold
# compiles.
if os.environ.get("GNN_TPU_TEST_CACHE") != "0":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache/cpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


@pytest.fixture(autouse=True, scope="module")
def _bound_live_executables():
    """Release compiled executables between test modules.

    A full-suite run used to die deterministically around the 70th test
    with SIGSEGV/SIGABRT inside XLA:CPU executable loading
    (compilation_cache.get_executable_and_time with the persistent cache
    on, backend_compile_and_load with it off) while every test passed
    solo: the suite accumulates hundreds of live jitted executables and
    the 8-virtual-device x64 pipeline programs are large, so loading yet
    another executable's JIT code eventually crashes the process
    (position-dependent, not content-dependent).  Dropping the jit caches
    at module boundaries keeps the live-code footprint bounded; the
    persistent cache makes the cross-module recompiles cheap
    (deserialization instead of compilation).  See CLAUDE.md
    "Machine gotchas".
    """
    yield
    jax.clear_caches()
    gc.collect()
