"""Test env: 8 virtual CPU devices (the JAX analogue of a fake process group,
SURVEY.md §4) so mesh/sharding logic is exercised without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The axon sitecustomize pins jax_platforms='axon,cpu'; repin to pure CPU
# before any backend is initialized so the 8 virtual devices take effect.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/sft_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert len(jax.devices()) == 8, f"expected 8 CPU devices, got {jax.devices()}"
