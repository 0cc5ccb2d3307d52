"""Honoring JAX_PLATFORMS under backend-registering site hooks.

Some deployments register an accelerator backend via an interpreter site
hook that bypasses JAX's own env-var handling, so ``JAX_PLATFORMS=cpu``
would silently (or, with the accelerator runtime unreachable, hangingly)
still pick the accelerator.  Every entry point (CLI and tools) applies the
override through this one helper so the condition cannot drift.
"""

from __future__ import annotations

import os


def apply_platform_override() -> None:
    """Applies any explicit JAX_PLATFORMS value via jax.config.

    No-op when the var is unset/empty or names the site hook's own platform
    (the hook already registered it; re-asserting it through jax.config can
    race the hook's plugin discovery).  Imports jax, so call it only on
    paths that are about to use jax anyway.
    """
    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms and platforms != "axon":
        import jax

        jax.config.update("jax_platforms", platforms)
