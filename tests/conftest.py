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


# ---------------------------------------------------------------------------
# slow tier (round-3 verdict #6): heavy long-horizon / rehearsal tests
# are skipped by default to keep the iteration loop under ~15 min; run
# the FULL suite with XIVO_SLOW=1 before committing filter-touching
# changes. Marking: @pytest.mark.slow or a module-level
# `pytestmark = pytest.mark.slow`.
# ---------------------------------------------------------------------------
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy test, skipped unless XIVO_SLOW=1")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("XIVO_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow tier: set XIVO_SLOW=1 to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
