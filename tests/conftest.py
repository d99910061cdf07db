"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment registers a TPU ('axon') backend via sitecustomize and sets
JAX_PLATFORMS=axon; tests must run on CPU with 8 virtual devices, so we both
set the XLA flag before any backend initializes and force the platform via
jax.config (env vars alone are overridden by the site registration).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# The suite is compile-bound (tiny shapes, many distinct jaxprs — measured
# ~9 min cold). Persist compiled executables across runs.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
