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
