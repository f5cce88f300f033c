"""NaN detection utilities.

The reference's only runtime guards are inline numpy asserts
(train_gan.py:162, inference.py:70,133, utils/utils.py:394-425).  Here:
the same host-side asserts plus opt-in device-side checking.
"""

from __future__ import annotations

import numpy as np


def assert_finite(name: str, *arrays) -> None:
    """Host-side NaN/Inf assert matching the reference's inline asserts."""
    for i, a in enumerate(arrays):
        a = np.asarray(a)
        if not np.isfinite(a).all():
            bad = int((~np.isfinite(a)).sum())
            raise AssertionError(
                f"{name}[{i}]: {bad}/{a.size} non-finite values"
            )


def enable_debug_nans(enable: bool = True) -> None:
    """Turn on jax's global NaN checking (jax_debug_nans)."""
    import jax

    jax.config.update("jax_debug_nans", enable)


def tree_check_finite(tree) -> dict:
    """Per-leaf finiteness report for a pytree (params/grads)."""
    import jax

    report = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        arr = np.asarray(leaf)
        n_bad = int((~np.isfinite(arr)).sum())
        if n_bad:
            report[name] = n_bad
    return report
