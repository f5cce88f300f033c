"""Forward/inverse kinematics over the 49-bone tree, as XLA scans.

Re-designs the reference's NumPy per-bone Python loops:

  * ``aa_to_xyz``  — conversion_utils.py:117-137: forward kinematics that
    rotates the parent-direction unit vector by each bone's axis-angle
    rotation (Rodrigues) and extends by the bone length.  Sequential over
    the 48 non-root bones (loop-carried through the tree), so implemented
    as ``lax.scan`` with gathered parent indices and vmapped over frames
    and clips.
  * ``xyz_to_aa``  — conversion_utils.py:140-155: per-bone independent,
    fully vectorized.
  * ``get_root_bone`` — utils/utils.py:33-41.
  * ``get_bone_length`` — 3DposeEstimator/pose3D.py:114-139 (mean bone
    length across all frames and clips; NB the reference keys lengths by
    bone index, not by bone-length class — reproduced).

The xyz layout per frame is 50 joints x 3 = 150 floats, joint j at columns
[3j, 3j+3); joints are numbered in bone order so bone i ends at joint i+1
(see ops/skeleton.py).  The aa layout per frame is 48 bones x 3 = 144
floats: bone i (i >= 1) at columns [3(i-1), 3(i-1)+3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_hand_pose_enhancement_for_sign_language_tpu.ops import batching, skeleton

_J = jnp.asarray(skeleton.BONE_START)  # (49,)
_E = jnp.asarray(skeleton.BONE_END)
_B = jnp.asarray(skeleton.BONE_BEFORE)
N_JOINTS = skeleton.N_JOINTS
N_BONES = skeleton.N_BONES


def clip_aa_to_xyz(aa_clip: jax.Array, root: jax.Array, bone_len: jax.Array) -> jax.Array:
    """FK for one clip: (T, 144) aa + (6,) root + (49,) bone_len -> (T, 150).

    Faithful to conversion_utils.py:117-137 including its lack of epsilon
    guards (a degenerate parent direction or zero rotation produces NaN,
    exactly like the reference; upstream rmv_clips_nan handles it).
    """
    T = aa_clip.shape[0]
    aa = aa_clip.reshape(T, N_BONES - 1, 3)
    root = root.astype(aa_clip.dtype)

    # Joint-major (n, T) coordinate planes: time rides the TPU lane
    # dimension at full width (the stacked (T, n, 3) carry put the
    # 3-wide axis in the lanes at ~2% utilization — same find as
    # lifting/init3d, TPU_PROBE.json "init_split").  The rotation
    # invariants (theta, axis, cos, sin) are carry-independent, so they
    # are precomputed for all 48 bones outside the scan.
    Px0 = jnp.zeros((N_JOINTS, T), aa_clip.dtype).at[0].set(root[0]).at[1].set(root[3])
    Py0 = jnp.zeros((N_JOINTS, T), aa_clip.dtype).at[0].set(root[1]).at[1].set(root[4])
    Pz0 = jnp.zeros((N_JOINTS, T), aa_clip.dtype).at[0].set(root[2]).at[1].set(root[5])

    aax = jnp.swapaxes(aa[..., 0], 0, 1)  # (48, T)
    aay = jnp.swapaxes(aa[..., 1], 0, 1)
    aaz = jnp.swapaxes(aa[..., 2], 0, 1)
    th = jnp.sqrt(aax * aax + aay * aay + aaz * aaz)
    kx, ky, kz = aax / th, aay / th, aaz / th  # unit axis (48, T)
    cos_t = jnp.cos(th)
    sin_t = jnp.sin(th)
    omc = 1.0 - cos_t

    def step(carry, inputs):
        Px, Py, Pz = carry
        j, b, e, L, kxr, kyr, kzr, cr, sr, or_ = inputs  # rows (T,)
        jx = jax.lax.dynamic_index_in_dim(Px, j, 0, False)
        jy = jax.lax.dynamic_index_in_dim(Py, j, 0, False)
        jz = jax.lax.dynamic_index_in_dim(Pz, j, 0, False)
        ux = jx - jax.lax.dynamic_index_in_dim(Px, b, 0, False)
        uy = jy - jax.lax.dynamic_index_in_dim(Py, b, 0, False)
        uz = jz - jax.lax.dynamic_index_in_dim(Pz, b, 0, False)
        un = jnp.sqrt(ux * ux + uy * uy + uz * uz)
        ux, uy, uz = ux / un, uy / un, uz / un
        # Rodrigues by components: v = u cos + (k x u) sin + k (k.u)(1-cos)
        dot = kxr * ux + kyr * uy + kzr * uz
        vx = ux * cr + (kyr * uz - kzr * uy) * sr + kxr * dot * or_
        vy = uy * cr + (kzr * ux - kxr * uz) * sr + kyr * dot * or_
        vz = uz * cr + (kxr * uy - kyr * ux) * sr + kzr * dot * or_
        Px = jax.lax.dynamic_update_index_in_dim(Px, jx + L * vx, e, 0)
        Py = jax.lax.dynamic_update_index_in_dim(Py, jy + L * vy, e, 0)
        Pz = jax.lax.dynamic_update_index_in_dim(Pz, jz + L * vz, e, 0)
        return (Px, Py, Pz), None

    inputs = (
        _J[1:],
        _B[1:],
        _E[1:],
        bone_len[1:].astype(aa_clip.dtype),
        kx, ky, kz, cos_t, sin_t, omc,
    )
    (Px, Py, Pz), _ = jax.lax.scan(step, (Px0, Py0, Pz0), inputs)
    xyz = jnp.stack([Px, Py, Pz], axis=-1)  # (n, T, 3)
    return jnp.swapaxes(xyz, 0, 1).reshape(T, N_JOINTS * 3)


clip_aa_to_xyz_jit = jax.jit(clip_aa_to_xyz)


def clip_xyz_to_aa(xyz_clip: jax.Array) -> jax.Array:
    """Inverse kinematics for one clip: (T, 150) -> (T, 144).

    Faithful to conversion_utils.py:140-155: theta from the angle between
    parent direction u and bone direction v (1e-6 in the cosine
    denominator), axis = normalize(u cross v) (+1e-6), aa = axis * theta.
    """
    T = xyz_clip.shape[0]
    xyz = xyz_clip.reshape(T, N_JOINTS, 3)
    p_j = xyz[:, _J[1:], :]  # (T, 48, 3)
    p_b = xyz[:, _B[1:], :]
    p_e = xyz[:, _E[1:], :]
    u = p_j - p_b
    v = p_e - p_j
    dot = jnp.sum(u * v, axis=-1)
    th = jnp.arccos(
        dot / (jnp.linalg.norm(u, axis=-1) * jnp.linalg.norm(v, axis=-1) + 1e-6)
    )
    a = jnp.cross(u, v)
    a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-6)
    return (a * th[..., None]).reshape(T, (N_BONES - 1) * 3)


clip_xyz_to_aa_jit = jax.jit(clip_xyz_to_aa)


def _as_clip_list(x):
    if isinstance(x, np.ndarray) and x.ndim == 3:
        return list(x)
    return x


def aa_to_xyz(aa, root, bone_len, structure=None) -> list:
    """List-of-clips FK (drop-in for conversion_utils.py:117-137).

    `structure` is accepted for API compatibility but the static tree from
    ops/skeleton.py is always used.
    """
    clips = _as_clip_list(aa)
    root = jnp.asarray(np.asarray(root, dtype=np.float32))
    bone_len = jnp.asarray(np.asarray(bone_len, dtype=np.float32))
    return batching.apply_clipwise(clip_aa_to_xyz, clips, root, bone_len)


def xyz_to_aa(xyz, structure=None) -> list:
    """List-of-clips inverse kinematics (conversion_utils.py:140-155)."""
    clips = _as_clip_list(xyz)
    return batching.apply_clipwise(clip_xyz_to_aa, clips)


def get_root_bone(xyz, structure=None) -> np.ndarray:
    """Mean (over all frames of all clips) of the root bone's two joints.

    Reference: utils/utils.py:33-41; returns a (6,) array
    [J0_xyz, E0_xyz] averaged across frames.
    """
    clips = _as_clip_list(xyz)
    j0, e0 = int(skeleton.BONE_START[0]), int(skeleton.BONE_END[0])
    total = np.zeros(6, dtype=np.float64)
    count = 0
    for c in clips:
        c = np.asarray(c)
        pts = np.hstack((c[:, j0 * 3 : j0 * 3 + 3], c[:, e0 * 3 : e0 * 3 + 3]))
        total += pts.sum(axis=0)
        count += pts.shape[0]
    return (total / count).astype(np.float32)


def get_bone_length(kp_3d, structure=None, dtype="float32") -> np.ndarray:
    """Mean length of each bone across all frames and clips.

    Reference: pose3D.py:114-139.  Returns (49,) indexed by bone (not by
    bone-length class), matching the reference's use of `iBone` as the key.
    """
    clips = _as_clip_list(kp_3d)
    sums = np.zeros(N_BONES, dtype=np.float64)
    counts = 0
    J = skeleton.BONE_START
    E = skeleton.BONE_END
    for c in clips:
        c = np.asarray(c)
        pts = c.reshape(c.shape[0], N_JOINTS, 3)
        d = pts[:, J, :] - pts[:, E, :]  # (T, 49, 3)
        lens = np.sqrt((d * d).sum(axis=-1))  # (T, 49)
        sums += lens.sum(axis=0)
        counts += lens.shape[0]
    return (sums / counts).astype(dtype)
