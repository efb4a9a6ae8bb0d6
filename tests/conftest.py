"""Test config: force CPU with 8 virtual devices so SPMD/sharding tests run
without TPU hardware (the pattern SURVEY.md 4.5 recommends).

NOTE: this image's sitecustomize imports jax and registers the axon TPU
plugin before pytest starts, so setting JAX_PLATFORMS via os.environ is too
late — we must go through jax.config, and XLA_FLAGS must be set before the
CPU backend is first initialized (it is lazy, so doing it here works).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: repeat suite runs skip the multi-minute
# model-compile steps
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
