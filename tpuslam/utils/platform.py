"""Platform selection helper.

This environment's ``sitecustomize`` may register a TPU backend before user
code runs, in which case ``JAX_PLATFORMS`` from the environment is captured
too early to change.  Call :func:`apply_env_platform` at tool/script startup
to honour the env var via ``jax.config`` (harmless when already correct).
"""

from __future__ import annotations

import os


def apply_env_platform() -> None:
    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms:
        import jax

        jax.config.update("jax_platforms", platforms)
