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
    enable_compilation_cache()


def enable_compilation_cache(path: str | None = None) -> None:
    """Persist XLA compilations across processes.

    Large programs (the full-SLAM sequence scan) take minutes to compile
    through the remote-TPU tunnel; the on-disk cache makes every process
    after the first start in seconds.  Respects an explicit
    ``JAX_COMPILATION_CACHE_DIR`` if the user already set one.
    """
    cache = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/tpuslam_jax_cache"
    )
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache)
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # older jax without these options — cache is best-effort
        pass
