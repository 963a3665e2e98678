"""Pytest bootstrap: force an 8-device virtual CPU mesh.

Tests exercise multi-chip sharding logic without TPU hardware, per the
reference test strategy replacement plan (SURVEY.md sections 4/7).

Note: a pytest plugin imports jax before this conftest runs, so the platform
must be forced through jax.config (env vars alone are read too early).
Without this, tests would silently target the remote axon TPU tunnel, where
every compile takes minutes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert not jax._src.xla_bridge._backends, (
    "JAX backends initialized before conftest could force CPU")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running validation (multi-process world, large-scale "
        "cross-engine games); skipped unless AZR_RUN_SLOW=1 or -m slow")


def pytest_collection_modifyitems(config, items):
    import pytest

    if os.environ.get("AZR_RUN_SLOW") or config.getoption("-m"):
        return
    skip = pytest.mark.skip(reason="slow; set AZR_RUN_SLOW=1 or -m slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
