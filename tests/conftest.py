"""Test configuration: force CPU JAX with an 8-device virtual mesh.

Must run before jax initializes a backend — pytest imports conftest first.
"""

import os

# Force CPU: the ambient environment points JAX_PLATFORMS at a remote TPU
# tunnel; unit tests must run on the local host with a virtual device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container's sitecustomize force-sets jax_platforms="axon,cpu" (remote
# TPU tunnel first) at interpreter start — env vars cannot override it, so
# pin the config explicitly.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the golden tests compile many small unique
# shapes; caching amortizes XLA compile time across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvf-jax-cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
