"""Platform selection honoring the JAX_PLATFORMS environment variable.

Some environments install a sitecustomize that force-sets
``jax.config.jax_platforms`` at interpreter start (e.g. a TPU tunnel
plugin), which silently overrides a user's ``JAX_PLATFORMS=cpu``.  Entry
points call `ensure_platform_from_env()` before any backend initializes so
the env var wins again.
"""

from __future__ import annotations

import os


def ensure_platform_from_env() -> None:
    enable_persistent_compile_cache()
    env = os.environ.get("JAX_PLATFORMS")
    if not env:
        return
    import jax

    try:
        current = jax.config.jax_platforms
    except AttributeError:
        return
    if current != env:
        jax.config.update("jax_platforms", env)


def enable_persistent_compile_cache() -> None:
    """Point XLA's persistent compilation cache at a stable directory so
    repeat CLI runs skip recompiles (TPU compiles through the tunnel take
    minutes for the big training programs).  Opt out with
    MHPE_COMPILE_CACHE=0; JAX_COMPILATION_CACHE_DIR still wins if set."""
    if os.environ.get("MHPE_COMPILE_CACHE", "1") == "0":
        return
    path = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.expanduser(
        "~/.cache/mhpe_jax_compile"
    )
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
    except Exception:
        pass  # cache is an optimization, never a failure
