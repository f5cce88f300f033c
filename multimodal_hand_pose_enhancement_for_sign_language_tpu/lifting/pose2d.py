"""2D pose preprocessing: normalization, pruning, interpolation.

Vectorized JAX re-implementations of 3DposeEstimator/pose2D.py:8-90
(per-frame/per-joint Python loops in the reference).  All functions take
an optional `mask` (T,) of valid frames so padded (shape-bucketed) clips
compute statistics over real frames only; with mask=None the semantics
are bit-faithful to the reference.

NB the reference's `normalization` contains a typo (`simga2 = 1e-10`,
pose2D.py:22-23) so its sigma is effectively unclamped — reproduced.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalization(Xx, Xy, mask=None):
    """Joint zero-mean/shared-sigma normalization over a clip.

    Returns (Xx_n, Xy_n, mux, muy, sigma) like pose2D.py:8-26.
    """
    T, n = Xx.shape
    if mask is None:
        mask = jnp.ones((T,), Xx.dtype)
    m = mask[:, None]
    sum0 = jnp.sum(mask) * n
    sum1Xx = jnp.sum(Xx * m)
    sum2Xx = jnp.sum(Xx * Xx * m)
    sum1Xy = jnp.sum(Xy * m)
    sum2Xy = jnp.sum(Xy * Xy * m)
    mux = sum1Xx / sum0
    muy = sum1Xy / sum0
    sum0 = 2 * sum0
    sum1 = sum1Xx + sum1Xy
    sum2 = sum2Xx + sum2Xy
    mu = sum1 / sum0
    sigma2 = (sum2 / sum0) - mu * mu
    # reference bug: the clamp assigns to a typo'd name, so sigma2 is
    # used unclamped (pose2D.py:22-24)
    sigma = jnp.sqrt(sigma2)
    return (Xx - mux) / sigma, (Xy - muy) / sigma, mux, muy, sigma


def prune(Xx, Xy, Xw, watch_this, threshold, dtype="float32"):
    """Zero out frames whose mean confidence over `watch_this` joints is
    below `threshold` (pose2D.py:29-46)."""
    watch = jnp.asarray(list(watch_this))
    Ew = jnp.mean(Xw[:, watch], axis=1)
    keep = (Ew >= threshold)[:, None].astype(Xx.dtype)
    return Xx * keep, Xy * keep, Xw * keep


def interpolation(Xx, Xy, Xw, threshold, dtype="float32", mask=None):
    """Confidence-weighted temporal interpolation with an expanding window
    (pose2D.py:49-90).

    For each (t, joint) the window [t-d, t+d] grows until the summed
    confidence reaches `threshold` or the clip is exhausted.  The
    reference's O(T^2) Python loop becomes a single `lax.scan` over window
    radii, accumulating side contributions incrementally (same f32 error
    profile as the reference's sequential sums — prefix-sum differencing
    would cancel catastrophically at image-scale coordinates).
    """
    T, N = Xw.shape
    if mask is not None:
        Xw = Xw * mask[:, None]
    wx = Xw * Xx
    wy = Xw * Xy
    t_idx = jnp.arange(T)

    def body(carry, d):
        done, sw, swx, swy = carry
        # contributions of frames t+d and t-d (in-bounds only)
        up = jnp.clip(t_idx + d, 0, T - 1)
        dn = jnp.clip(t_idx - d, 0, T - 1)
        up_ok = ((t_idx + d) < T)[:, None].astype(Xw.dtype)
        dn_ok = ((t_idx - d) >= 0)[:, None].astype(Xw.dtype)
        add_w = Xw[up, :] * up_ok + Xw[dn, :] * dn_ok
        add_x = wx[up, :] * up_ok + wx[dn, :] * dn_ok
        add_y = wy[up, :] * up_ok + wy[dn, :] * dn_ok
        grow = (~done).astype(Xw.dtype)
        sw = sw + add_w * grow
        swx = swx + add_x * grow
        swy = swy + add_y * grow
        done = done | (sw >= threshold)
        return (done, sw, swx, swy), None

    init = (Xw >= threshold, Xw, wx, wy)  # d = 0: the center frame itself
    (done, sw, swx, swy), _ = jax.lax.scan(body, init, jnp.arange(1, T))
    sw = jnp.where(sw <= 0.0, 1e-10, sw)
    return swx / sw, swy / sw, Xw
