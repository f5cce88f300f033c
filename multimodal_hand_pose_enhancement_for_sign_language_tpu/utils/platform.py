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
