"""Initial 3D pose estimation: bone-length medians + closed-form angle
hypotheses (computeB) + forward accumulation.

Vectorized JAX re-implementation of 3DposeEstimator/pose2Dto3D.py:33-159.
The per-(bone, frame) Python loops become a `lax.scan` over the 49 bones
(loop-carried through the tree) with every frame solved in parallel; the
hypothesis selection reproduces the reference's order-dependent first-
minimum rule and all of its nan/inf guard semantics (:49-51, :130-143).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_hand_pose_enhancement_for_sign_language_tpu.ops import skeleton

_EPS = 1e-10


def add_noise(x, rng, epsilon):
    """Uniform noise from a NumPy RandomState (pose2Dto3D.py:12-14)."""
    e = np.asarray(rng.uniform(low=-epsilon, high=epsilon, size=x.shape), "float32")
    return x + e


def bone_length_classes(Xx, Xy, mask=None, dtype=jnp.float32):
    """Log median 2D length per bone-length class (pose2Dto3D.py:100-116).

    Lengths are pooled over all frames of every bone sharing a class; the
    median is the reference's `perc(lst, 0.5)` = sorted[int(0.5*(len-1))].
    With a frame mask, padded frames sort to +inf and the index uses the
    real count.
    """
    T = Xx.shape[0]
    J, E, C = skeleton.BONE_START, skeleton.BONE_END, skeleton.BONE_LENGTH_CLASS
    dx = Xx[:, J] - Xx[:, E]  # (T, 49)
    dy = Xy[:, J] - Xy[:, E]
    L = jnp.sqrt(dx * dx + dy * dy)  # (T, 49)
    if mask is None:
        t_real = T
        Lm = L
    else:
        t_real = jnp.sum(mask).astype(jnp.int32)
        Lm = jnp.where(mask[:, None] > 0, L, jnp.inf)

    lines = []
    for c in range(skeleton.N_LENGTH_CLASSES):
        members = np.nonzero(skeleton.BONE_LENGTH_CLASS == c)[0]
        pool = Lm[:, members].reshape(-1)  # (T * n_members,)
        pool = jnp.sort(pool)
        n_valid = jnp.asarray(t_real * len(members), jnp.float32)
        idx = (0.5 * (n_valid - 1)).astype(jnp.int32)
        lines.append(jnp.log(pool[idx] + 1e-9))
    return jnp.stack(lines).astype(dtype)


def compute_b(ax, ay, az, tx, ty, L):
    """Closed-form angle hypothesis solve, vectorized over frames.

    Faithful transcription of pose2Dto3D.py:33-65: up to six hypotheses
    per frame, first minimum of the 2D reprojection error wins (strict >
    comparison == first-argmin).
    """
    dx = tx - ax
    dy = ty - ay
    # h0: in-plane direction
    foo = L**2 - dx**2 - dy**2
    sq = jnp.sqrt(jnp.maximum(foo, 0.0))
    foo1 = ax**2 - 2 * ax * tx + ay**2 - 2 * ay * ty + tx**2 + ty**2
    foo2 = (1.0 / foo1) ** 0.5
    common = (
        ay**3 / foo1
        + (ax**2 * ay) / foo1
        + (ay * tx**2) / foo1
        + (ay * ty**2) / foo1
        - (2 * ay**2 * ty) / foo1
        - (2 * ax * ay * tx) / foo1
    )
    foo3 = common + L * ay * foo2 - L * ty * foo2
    foo4 = common - L * ay * foo2 + L * ty * foo2
    xx1 = -(ax * ty - ay * tx - ax * foo3 + tx * foo3) / (ay - ty)
    xx2 = -(ax * ty - ay * tx - ax * foo4 + tx * foo4) / (ay - ty)
    xy1 = foo3
    xy2 = foo4

    def stack_h(hx, hy, hz):
        return jnp.stack([hx, hy, hz], axis=-1)

    zeros = jnp.zeros_like(dx)
    hyps = jnp.stack(
        [
            stack_h(dx, dy, zeros),
            stack_h(dx, dy, -sq),
            stack_h(dx, dy, sq),
            stack_h(xx1 - ax, xy1 - ay, zeros),
            stack_h(xx2 - ax, xy2 - ay, zeros),
        ],
        axis=-2,
    )  # (T, 5, 3)

    finite34 = jnp.isfinite(0.0 * xx1 * xx2 * xy1 * xy2)
    valid = jnp.stack(
        [
            jnp.ones_like(dx, bool),
            foo >= 0,
            foo >= 0,
            finite34,
            finite34,
        ],
        axis=-1,
    )  # (T, 5)

    norm_h = jnp.sqrt(jnp.sum(hyps * hyps, axis=-1)) + _EPS
    xi_x = ax[..., None] + L * hyps[..., 0] / norm_h
    xi_y = ay[..., None] + L * hyps[..., 1] / norm_h
    Li_raw = (xi_x - tx[..., None]) ** 2 + (xi_y - ty[..., None]) ** 2
    Li = jnp.where(valid & jnp.isfinite(Li_raw), Li_raw, jnp.inf)
    best = jnp.argmin(Li, axis=-1)  # first minimum, matching strict >
    # reference quirk (pose2Dto3D.py:52-64): the first hypothesis is always
    # assigned (Lmin is None), and a NaN Lmin is never displaced — so when
    # h0's error is non-finite, h0 wins regardless of later hypotheses
    best = jnp.where(jnp.isfinite(Li_raw[..., 0]), best, 0)
    return jnp.take_along_axis(hyps, best[..., None, None].repeat(3, -1), -2)[
        ..., 0, :
    ]


def initialization(Xx, Xy, Xw, sigma, noise=None, rng=None, dtype="float32", mask=None):
    """Initial 3D estimate (pose2Dto3D.py:73-159).

    `noise`: optional (3, T) array of precomputed uniform noise for the
    root (x, y, z) — pass `add_noise`-style draws for bit-parity with the
    reference's RandomState(1234); otherwise supply a jax `rng` key.

    Returns (lines, rootsx, rootsy, rootsz, anglesx, anglesy, anglesz,
    Yx, Yy, Yz) with the reference's shapes.
    """
    T, n = Xx.shape
    n_bones = skeleton.N_BONES

    lines = bone_length_classes(Xx, Xy, mask=mask)
    L_per_bone = jnp.exp(lines[jnp.asarray(skeleton.BONE_LENGTH_CLASS)])  # (49,)

    rootsx = Xx[:, 0]
    rootsy = Xy[:, 0]
    rootsz = jnp.zeros((T,), Xx.dtype)
    if noise is not None:
        rootsx = rootsx + noise[0]
        rootsy = rootsy + noise[1]
        rootsz = rootsz + noise[2]
    elif rng is not None:
        k1, k2, k3 = jax.random.split(rng, 3)
        rootsx = rootsx + jax.random.uniform(k1, (T,), Xx.dtype, -sigma, sigma)
        rootsy = rootsy + jax.random.uniform(k2, (T,), Xx.dtype, -sigma, sigma)
        rootsz = rootsz + jax.random.uniform(k3, (T,), Xx.dtype, -sigma, sigma)

    Y0 = jnp.zeros((T, n, 3), Xx.dtype)
    Y0 = Y0.at[:, 0, 0].set(rootsx)
    Y0 = Y0.at[:, 0, 1].set(rootsy)
    Y0 = Y0.at[:, 0, 2].set(rootsz)

    def step(Y, inputs):
        a, b, L = inputs
        ax, ay, az = Y[:, a, 0], Y[:, a, 1], Y[:, a, 2]
        tx, ty = Xx[:, b], Xy[:, b]
        angle = compute_b(ax, ay, az, tx, ty, L)
        gx, gy, gz = angle[:, 0], angle[:, 1], angle[:, 2]
        # nan/inf guards (pose2Dto3D.py:130-143)
        gx = jnp.where(jnp.isfinite(gx), gx, 0.0)
        gy = jnp.where(jnp.isfinite(gy), gy, 0.0)
        gz = jnp.where(jnp.isfinite(gz), gz, 0.0)
        all_zero = (gx == 0.0) & (gy == 0.0) & (gz == 0.0)
        gx = jnp.where(all_zero, 1.0, gx)
        gy = jnp.where(all_zero, 1.0, gy)
        gz = jnp.where(all_zero, 1.0, gz)
        gz = jnp.abs(gz) + 0.001
        norm = jnp.sqrt(gx * gx + gy * gy + gz * gz) + _EPS
        gx, gy, gz = gx / norm, gy / norm, gz / norm
        pb = jnp.stack(
            [Y[:, a, 0] + L * gx, Y[:, a, 1] + L * gy, Y[:, a, 2] + L * gz], -1
        )
        Y = jax.lax.dynamic_update_slice(Y, pb[:, None, :], (0, b, 0))
        return Y, jnp.stack([gx, gy, gz], -1)

    inputs = (
        jnp.asarray(skeleton.BONE_START),
        jnp.asarray(skeleton.BONE_END),
        L_per_bone,
    )
    Y, angles = jax.lax.scan(step, Y0, inputs)  # angles: (49, T, 3)
    anglesx = jnp.swapaxes(angles[..., 0], 0, 1)  # (T, 49)
    anglesy = jnp.swapaxes(angles[..., 1], 0, 1)
    anglesz = jnp.swapaxes(angles[..., 2], 0, 1)

    return (
        lines,
        rootsx[:, None],
        rootsy[:, None],
        rootsz[:, None],
        anglesx,
        anglesy,
        anglesz,
        Y[..., 0],
        Y[..., 1],
        Y[..., 2],
    )
