"""Test configuration: CPU-only JAX with 8 virtual devices and float64.

Multi-chip sharding tests run on a simulated 8-device CPU mesh (the
TPU-native substitute for a fake distributed backend, SURVEY.md section 4);
float64 matches the reference's NumPy numerics for parity tests.
"""

import os

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
# Persistent compile cache DISABLED for the suite: on some machine
# images jaxlib segfaults deserializing a cache entry mid-suite
# (deterministically at the ~70th test, reads fine solo — see CLAUDE.md
# "Machine gotchas").  Set GNN_TPU_TEST_CACHE=1 to opt back in locally.
if os.environ.get("GNN_TPU_TEST_CACHE") == "1":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache/cpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
