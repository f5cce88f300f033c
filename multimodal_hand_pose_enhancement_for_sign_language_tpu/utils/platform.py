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


def host_fingerprint() -> str:
    """Short hash of the host CPU's feature set.  XLA:CPU AOT artifacts
    are machine-specific — loading an entry compiled on a different CPU
    generation emits 'machine type ... doesn't match' errors and risks
    SIGILL/garbage — so cache directories are keyed by this."""
    import hashlib
    import platform as plat

    txt = plat.machine()
    # flags alone are NOT enough: two host generations with identical
    # cpuinfo flags can differ in LLVM's model-specific tuning features
    # (e.g. prefer-no-scatter/gather), and XLA loads such foreign AOT
    # entries with only a warning — so key on the CPU model identity too.
    wanted = ("flags", "Features", "cpu family", "model", "stepping")
    try:
        seen = set()
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key.startswith(wanted) and key not in seen:
                    seen.add(key)
                    txt += line
    except OSError:
        pass
    return hashlib.sha1(txt.encode()).hexdigest()[:10]


def enable_persistent_compile_cache() -> None:
    """Point XLA's persistent compilation cache at a stable,
    host-fingerprinted directory so repeat CLI runs skip recompiles (TPU
    compiles through the tunnel take minutes for the big training
    programs) without ever loading another machine's AOT artifacts.  Opt
    out with MHPE_COMPILE_CACHE=0; JAX_COMPILATION_CACHE_DIR still wins
    if set."""
    if os.environ.get("MHPE_COMPILE_CACHE", "1") == "0":
        return
    path = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.expanduser(
        "~/.cache/mhpe_jax_compile/" + host_fingerprint()
    )
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
    except Exception:
        pass  # cache is an optimization, never a failure
