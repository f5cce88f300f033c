"""Rotation representation conversions: rot6d <-> matrix <-> axis-angle.

Re-designs the reference's ``utils/conversion_utils.py`` (scipy loops +
``Pool(24)``) as fully batched, jit-compiled JAX:

  * ``rot6d_to_mat`` reproduces the Gram-Schmidt reconstruction of
    conversion_utils.py:86-107 (including its 1e-6 norm epsilons),
  * ``mat_to_rot6d`` matches conversion_utils.py:12-29 (concatenate the
    first two matrix *columns*),
  * ``aa_to_mat``/``mat_to_aa`` replace scipy ``Rotation.from_rotvec`` /
    ``as_rotvec`` (conversion_utils.py:38-39,63-64) with a pure-JAX
    Rodrigues map and a quaternion-based log map (numerically matching
    scipy's quaternion path, including near theta=0 and theta=pi),
  * clip-level helpers operate on the (T, 6*n)/(T, 3*n) per-frame block
    layout used throughout the pipeline (conversion_utils.py:44-56,72-81),
    vmapped instead of multiprocess-pooled.

All functions broadcast over arbitrary leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_hand_pose_enhancement_for_sign_language_tpu.ops import batching

_GS_EPS = 1e-6  # epsilon used by the reference's Gram-Schmidt (":92,:94")


def rot6d_to_mat(r6d: jax.Array) -> jax.Array:
    """(..., 6) -> (..., 3, 3) via Gram-Schmidt on the two encoded columns.

    Column convention matches conversion_utils.py:86-107: the 6 numbers are
    the first two *columns* of the rotation matrix; the result has columns
    [x, y, z] with x = normalize(c0), z = normalize(x cross c1), y = z cross x.
    """
    x_raw = r6d[..., 0:3]
    y_raw = r6d[..., 3:6]
    x = x_raw / (jnp.linalg.norm(x_raw, axis=-1, keepdims=True) + _GS_EPS)
    z = jnp.cross(x, y_raw)
    z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + _GS_EPS)
    y = jnp.cross(z, x)
    # stack as columns: mat[..., i, j] has columns x,y,z
    return jnp.stack([x, y, z], axis=-1)


def mat_to_rot6d(mat: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 6): concatenation of the first two columns.

    Reference: conversion_utils.py:12-29 (np_mat[..., 0] and np_mat[..., 1]
    index the last axis of a (..., 3, 3) array, i.e. matrix columns).
    """
    return jnp.concatenate([mat[..., :, 0], mat[..., :, 1]], axis=-1)


def aa_to_mat(aa: jax.Array) -> jax.Array:
    """Axis-angle (rotation vector) (..., 3) -> rotation matrix (..., 3, 3).

    Rodrigues formula with Taylor guards at theta -> 0 so that it is exact,
    differentiable, and matches scipy ``Rotation.from_rotvec``.
    """
    theta2 = jnp.sum(aa * aa, axis=-1, keepdims=True)[..., None]  # (...,1,1)
    theta = jnp.sqrt(theta2)
    small = theta2 < 1e-12
    # sin(t)/t and (1-cos(t))/t^2 with series fallbacks
    sinc = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / jnp.where(small, 1.0, theta))
    cosc = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2))
    kx, ky, kz = aa[..., 0], aa[..., 1], aa[..., 2]
    zeros = jnp.zeros_like(kx)
    K = jnp.stack(
        [
            jnp.stack([zeros, -kz, ky], axis=-1),
            jnp.stack([kz, zeros, -kx], axis=-1),
            jnp.stack([-ky, kx, zeros], axis=-1),
        ],
        axis=-2,
    )
    # Use K^2 = k k^T - theta^2 I, so R = cos(t) I + sinc K + cosc k k^T.
    # Pure elementwise (VPU) math; avoids a 3x3 matmul whose default XLA
    # precision is too low for geometry.
    outer = aa[..., :, None] * aa[..., None, :]
    eye = jnp.eye(3, dtype=aa.dtype)
    cos_t = 1.0 - cosc * theta2  # == cos(theta), exact for the small branch
    return cos_t * eye + sinc * K + cosc * outer


def mat_to_quat(mat: jax.Array) -> jax.Array:
    """(..., 3, 3) -> unit quaternion (..., 4) as (x, y, z, w), w >= 0.

    Branchless Shepperd-style construction (computes all four candidate
    quaternions and picks the best-conditioned one), matching scipy's
    ``Rotation.from_matrix`` quaternion up to sign; sign is canonicalized
    to w >= 0 as scipy does before ``as_rotvec``.
    """
    m = mat
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidates (unnormalized) in (w, x, y, z), one per dominant term
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    def _to_xyzw(q):
        return jnp.stack([q[..., 1], q[..., 2], q[..., 3], q[..., 0]], axis=-1)

    cand = jnp.stack([_to_xyzw(qw), _to_xyzw(qx), _to_xyzw(qy), _to_xyzw(qz)], axis=-2)

    scores = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cand, best[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonicalize sign: w >= 0
    return q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)


def quat_to_aa(q: jax.Array) -> jax.Array:
    """Unit quaternion (x, y, z, w), w>=0 -> rotation vector (..., 3)."""
    v = q[..., 0:3]
    w = q[..., 3]
    n = jnp.linalg.norm(v, axis=-1)
    angle = 2.0 * jnp.arctan2(n, w)
    small = n < 1e-9
    scale = jnp.where(small, 2.0, angle / jnp.where(small, 1.0, n))
    return v * scale[..., None]


def mat_to_aa(mat: jax.Array) -> jax.Array:
    """(..., 3, 3) -> rotation vector (..., 3); matches scipy as_rotvec."""
    return quat_to_aa(mat_to_quat(mat))


def aa_to_mat_rot6d(aa: jax.Array) -> jax.Array:
    """(..., 3) axis-angle -> (..., 6) rot6d."""
    return mat_to_rot6d(aa_to_mat(aa))


def rot6d_to_aa_vec(r6d: jax.Array) -> jax.Array:
    """(..., 6) rot6d -> (..., 3) axis-angle."""
    return mat_to_aa(rot6d_to_mat(r6d))


# ---------------------------------------------------------------------------
# Clip-level block layout helpers
# ---------------------------------------------------------------------------


# The clip-level converters below are the save_results/process_dataset
# hot path (every frame of every clip).  They compute on SEPARATE scalar
# planes flattened to 1-D — the stacked (..., 3, 3) / (..., 4) forms put
# a 3- or 4-wide axis in the TPU lane dimension (~2-3% lane utilization),
# which measured 164 ms for a 49K-frame r6d->aa batch; the plane form is
# the same math at full lane width (same find as the lifting scans,
# TPU_PROBE.json "conversion_chain").  The stacked mat/quat API above is
# kept for generic use and as the oracle the plane form is tested against.


def _rot6d_to_aa_planes(a0, a1, a2, b0, b1, b2):
    """Component-plane r6d -> axis-angle: Gram-Schmidt + Shepperd
    candidates (first-max where-chain == argmax) + atan2 log map."""
    xn = jnp.sqrt(a0 * a0 + a1 * a1 + a2 * a2) + _GS_EPS
    x0, x1, x2 = a0 / xn, a1 / xn, a2 / xn
    z0 = x1 * b2 - x2 * b1
    z1 = x2 * b0 - x0 * b2
    z2 = x0 * b1 - x1 * b0
    zn = jnp.sqrt(z0 * z0 + z1 * z1 + z2 * z2) + _GS_EPS
    z0, z1, z2 = z0 / zn, z1 / zn, z2 / zn
    y0 = z1 * x2 - z2 * x1
    y1 = z2 * x0 - z0 * x2
    y2 = z0 * x1 - z1 * x0
    # rotation matrix with columns [x, y, z]
    m00, m01, m02 = x0, y0, z0
    m10, m11, m12 = x1, y1, z1
    m20, m21, m22 = x2, y2, z2
    tr = m00 + m11 + m22
    scores = (
        1.0 + tr,
        1.0 + m00 - m11 - m22,
        1.0 - m00 + m11 - m22,
        1.0 - m00 - m11 + m22,
    )
    cands = (
        (m21 - m12, m02 - m20, m10 - m01, scores[0]),
        (scores[1], m01 + m10, m02 + m20, m21 - m12),
        (m01 + m10, scores[2], m12 + m21, m02 - m20),
        (m02 + m20, m12 + m21, scores[3], m10 - m01),
    )
    best_s = scores[0]
    qx, qy, qz, qw = cands[0]
    for s, c in zip(scores[1:], cands[1:]):
        better = s > best_s  # strict: ties keep the earlier == first argmax
        best_s = jnp.where(better, s, best_s)
        qx = jnp.where(better, c[0], qx)
        qy = jnp.where(better, c[1], qy)
        qz = jnp.where(better, c[2], qz)
        qw = jnp.where(better, c[3], qw)
    qn = jnp.sqrt(qx * qx + qy * qy + qz * qz + qw * qw)
    qx, qy, qz, qw = qx / qn, qy / qn, qz / qn, qw / qn
    sign = jnp.where(qw < 0, -1.0, 1.0)
    qx, qy, qz, qw = qx * sign, qy * sign, qz * sign, qw * sign
    n = jnp.sqrt(qx * qx + qy * qy + qz * qz)
    angle = 2.0 * jnp.arctan2(n, qw)
    small = n < 1e-9
    scale = jnp.where(small, 2.0, angle / jnp.where(small, 1.0, n))
    return qx * scale, qy * scale, qz * scale


def _aa_to_rot6d_planes(k0, k1, k2):
    """Component-plane axis-angle -> r6d: the first two Rodrigues columns
    (R = cos I + sinc K + cosc k k^T) directly, Taylor-guarded."""
    theta2 = k0 * k0 + k1 * k1 + k2 * k2
    small = theta2 < 1e-12
    theta = jnp.sqrt(theta2)
    sinc = jnp.where(
        small, 1.0 - theta2 / 6.0, jnp.sin(theta) / jnp.where(small, 1.0, theta)
    )
    cosc = jnp.where(
        small,
        0.5 - theta2 / 24.0,
        (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2),
    )
    cos_t = 1.0 - cosc * theta2
    r00 = cos_t + cosc * k0 * k0
    r10 = sinc * k2 + cosc * k1 * k0
    r20 = -sinc * k1 + cosc * k2 * k0
    r01 = -sinc * k2 + cosc * k0 * k1
    r11 = cos_t + cosc * k1 * k1
    r21 = sinc * k0 + cosc * k2 * k1
    return r00, r10, r20, r01, r11, r21


@jax.jit
def clip_rot6d_to_aa(r6d_clip: jax.Array) -> jax.Array:
    """(T, 6*n) -> (T, 3*n): per-bone rot6d blocks to axis-angle blocks.

    Replaces conversion_utils.py:44-48 (per-column Python loop).
    """
    T, D = r6d_clip.shape
    n = D // 6
    blocks = r6d_clip.reshape(T * n, 6)
    aa = _rot6d_to_aa_planes(*(blocks[:, i] for i in range(6)))
    return jnp.stack(aa, axis=-1).reshape(T, n * 3)


@jax.jit
def clip_aa_to_rot6d(aa_clip: jax.Array) -> jax.Array:
    """(T, 3*n) -> (T, 6*n). Replaces conversion_utils.py:72-81."""
    T, D = aa_clip.shape
    n = D // 3
    blocks = aa_clip.reshape(T * n, 3)
    r6d = _aa_to_rot6d_planes(*(blocks[:, i] for i in range(3)))
    return jnp.stack(r6d, axis=-1).reshape(T, n * 6)


def _as_clip_list(x):
    if isinstance(x, np.ndarray) and x.ndim == 3:
        return list(x)
    return x


def rot6d_to_aa(r6d) -> list:
    """List of (T_i, 6n) clips (or (N,T,6n) array) -> list of (T_i, 3n).

    Drop-in for conversion_utils.py:51-56 — the Pool(24) starmap becomes a
    few shape-bucketed batched XLA calls.
    """
    clips = _as_clip_list(r6d)
    return batching.apply_clipwise(clip_rot6d_to_aa, clips)


def aa_to_rot6d(aa) -> list:
    """List of (T_i, 3n) clips (or array) -> list of (T_i, 6n) clips.

    Drop-in for conversion_utils.py:72-81.
    """
    clips = _as_clip_list(aa)
    return batching.apply_clipwise(clip_aa_to_rot6d, clips)


# numpy-compatible aliases mirroring the reference names
def np_rot6d_to_mat(np_r6d):
    """(..., 6) -> (..., 9) flat rotation matrix (reference-shaped output)."""
    np_r6d = np.asarray(np_r6d)
    shape = np_r6d.shape
    mat = np.asarray(rot6d_to_mat(jnp.asarray(np_r6d.reshape(-1, 6))))
    if len(shape) == 1:
        return mat.reshape(9)
    return mat.reshape(shape[:-1] + (9,))


def np_mat_to_rot6d(np_mat):
    """(..., 3, 3) or (..., 9) -> (..., 6) (reference-shaped output)."""
    np_mat = np.asarray(np_mat)
    shape = np_mat.shape
    if not ((shape[-1] == 3 and shape[-2] == 3) or shape[-1] == 9):
        raise AttributeError(
            f"expected [..., 9] or [..., 3, 3], got shape {shape}"
        )
    mat = np_mat.reshape(-1, 3, 3)
    r6d = np.asarray(mat_to_rot6d(jnp.asarray(mat)))
    if len(shape) == 1:
        return r6d.reshape(6)
    return r6d
