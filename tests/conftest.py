"""Test environment: 8 virtual CPU devices, float64 enabled.

Must set env vars before jax initializes its backends (mirrors the survey's
test strategy, SURVEY.md §4: emulated-mesh testing without a cluster).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon default
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")  # the env-var alone loses to sitecustomize
jax.config.update("jax_enable_x64", True)
