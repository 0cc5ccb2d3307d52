"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding logic is validated on a virtual CPU mesh
(SURVEY.md §4c); the real TPU chip is exercised by bench.py and the
scripts under tools/, not by the unit test suite.

Note: this machine's site hook force-registers the axon TPU backend at
interpreter start and overrides JAX_PLATFORMS, so we must also override via
jax.config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop live compiled executables after each test module.

    The suite compiles hundreds of shape-distinct XLA:CPU modules in one
    process; with them all held live, XLA:CPU has segfaulted on this
    1-vCPU host deep into the suite (large interpret-mode Pallas HLO in
    tests/test_ring.py — each such test passes standalone).  Cross-module
    jit cache hits are rare here (modules use distinct shapes), so
    clearing costs little and bounds the executable footprint."""
    yield
    jax.clear_caches()
