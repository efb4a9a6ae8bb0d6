"""Test config: force CPU with 8 virtual devices so SPMD/sharding tests run
without TPU hardware (the pattern SURVEY.md 4.5 recommends)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session presets axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
