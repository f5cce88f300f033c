"""Gradient-flow inspection for a grads pytree.

Reference: viz/track_grads.py:9-40 (per-layer mean/max abs-gradient bar
chart).  Operates on a JAX grads pytree instead of named_parameters.
"""

from __future__ import annotations

import jax
import numpy as np


def grad_flow_stats(grads) -> dict:
    """Per-leaf mean/max absolute gradient, keyed by pytree path."""
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    stats = {}
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        arr = np.asarray(leaf)
        stats[name] = {"ave": float(np.abs(arr).mean()), "max": float(np.abs(arr).max())}
    return stats


def plot_grad_flow(grads, out_path="grad_flow.png"):
    """Bar chart of gradient flow (kernel/scale leaves only, like the
    reference's weight filter)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    stats = {
        k: v
        for k, v in grad_flow_stats(grads).items()
        if k.endswith("kernel") or k.endswith("scale")
    }
    names = list(stats)
    ave = [stats[n]["ave"] for n in names]
    mx = [stats[n]["max"] for n in names]
    fig, ax = plt.subplots(figsize=(max(6, len(names) * 0.4), 5))
    x = np.arange(len(names))
    ax.bar(x, mx, alpha=0.4, lw=1, color="c", label="max-gradient")
    ax.bar(x, ave, alpha=0.7, lw=1, color="b", label="mean-gradient")
    ax.set_xticks(x)
    ax.set_xticklabels(names, rotation=90, fontsize=6)
    ax.set_ylabel("average gradient")
    ax.set_title("Gradient flow")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=100)
    plt.close(fig)
    return out_path
