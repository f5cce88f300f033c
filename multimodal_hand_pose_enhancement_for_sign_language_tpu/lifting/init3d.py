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
    Returns the winning (bx, by, bz) as three arrays shaped like `ax`.

    Faithful transcription of pose2Dto3D.py:33-65: up to six hypotheses
    per frame, first minimum of the 2D reprojection error wins (strict >
    comparison == first-argmin).

    TPU layout note: the hypotheses are kept as SEPARATE same-shape
    arrays with an explicit first-minimum where-chain instead of a
    stacked (..., 5, 3) tensor — stacking put the 3-wide coordinate axis
    in the lane dimension (~2% lane utilization), which made this scan
    75% of end-to-end lift time (TPU_PROBE.json "init_split")."""
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

    zeros = jnp.zeros_like(dx)
    finite34 = jnp.isfinite(0.0 * xx1 * xx2 * xy1 * xy2)
    candidates = [
        (dx, dy, zeros, jnp.ones_like(dx, bool)),
        (dx, dy, -sq, foo >= 0),
        (dx, dy, sq, foo >= 0),
        (xx1 - ax, xy1 - ay, zeros, finite34),
        (xx2 - ax, xy2 - ay, zeros, finite34),
    ]

    def reproj_err(hx, hy, hz):
        norm_h = jnp.sqrt(hx * hx + hy * hy + hz * hz) + _EPS
        xi_x = ax + L * hx / norm_h
        xi_y = ay + L * hy / norm_h
        return (xi_x - tx) ** 2 + (xi_y - ty) ** 2

    h0x, h0y, h0z, _ = candidates[0]
    L0_raw = reproj_err(h0x, h0y, h0z)
    best_l = jnp.where(jnp.isfinite(L0_raw), L0_raw, jnp.inf)
    bx, by, bz = h0x, h0y, h0z
    for hx, hy, hz, valid in candidates[1:]:
        li_raw = reproj_err(hx, hy, hz)
        li = jnp.where(valid & jnp.isfinite(li_raw), li_raw, jnp.inf)
        better = li < best_l  # strict: ties keep the earlier hypothesis
        best_l = jnp.where(better, li, best_l)
        bx = jnp.where(better, hx, bx)
        by = jnp.where(better, hy, by)
        bz = jnp.where(better, hz, bz)
    # reference quirk (pose2Dto3D.py:52-64): the first hypothesis is always
    # assigned (Lmin is None), and a NaN Lmin is never displaced — so when
    # h0's error is non-finite, h0 wins regardless of later hypotheses
    keep0 = ~jnp.isfinite(L0_raw)
    bx = jnp.where(keep0, h0x, bx)
    by = jnp.where(keep0, h0y, by)
    bz = jnp.where(keep0, h0z, bz)
    return bx, by, bz


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

    # Joint-major (n, T) coordinate planes: time rides the TPU lane
    # dimension at full width, and each scan step's read/update touches
    # one contiguous row.  The old (T, n, 3) carry put the 3-wide axis in
    # the lanes (~2% utilization) — this scan was 75% of end-to-end lift
    # time (TPU_PROBE.json "init_split").
    XxT = jnp.swapaxes(Xx, 0, 1)  # (n, T)
    XyT = jnp.swapaxes(Xy, 0, 1)
    Yx0 = jnp.zeros((n, T), Xx.dtype).at[0].set(rootsx)
    Yy0 = jnp.zeros((n, T), Xx.dtype).at[0].set(rootsy)
    Yz0 = jnp.zeros((n, T), Xx.dtype).at[0].set(rootsz)

    def step(carry, inputs):
        Yx, Yy, Yz = carry
        a, b, L = inputs
        ax = jax.lax.dynamic_index_in_dim(Yx, a, 0, keepdims=False)
        ay = jax.lax.dynamic_index_in_dim(Yy, a, 0, keepdims=False)
        az = jax.lax.dynamic_index_in_dim(Yz, a, 0, keepdims=False)
        tx = jax.lax.dynamic_index_in_dim(XxT, b, 0, keepdims=False)
        ty = jax.lax.dynamic_index_in_dim(XyT, b, 0, keepdims=False)
        gx, gy, gz = compute_b(ax, ay, az, tx, ty, L)
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
        Yx = jax.lax.dynamic_update_index_in_dim(Yx, ax + L * gx, b, 0)
        Yy = jax.lax.dynamic_update_index_in_dim(Yy, ay + L * gy, b, 0)
        Yz = jax.lax.dynamic_update_index_in_dim(Yz, az + L * gz, b, 0)
        return (Yx, Yy, Yz), (gx, gy, gz)

    inputs = (
        jnp.asarray(skeleton.BONE_START),
        jnp.asarray(skeleton.BONE_END),
        L_per_bone,
    )
    (Yx, Yy, Yz), (gxs, gys, gzs) = jax.lax.scan(
        step, (Yx0, Yy0, Yz0), inputs
    )  # gxs: (49, T)

    return (
        lines,
        rootsx[:, None],
        rootsy[:, None],
        rootsz[:, None],
        jnp.swapaxes(gxs, 0, 1),  # (T, 49)
        jnp.swapaxes(gys, 0, 1),
        jnp.swapaxes(gzs, 0, 1),
        jnp.swapaxes(Yx, 0, 1),  # (T, n)
        jnp.swapaxes(Yy, 0, 1),
        jnp.swapaxes(Yz, 0, 1),
    )
