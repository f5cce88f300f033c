"""Geometry core tests: rot6d/aa/mat conversions vs scipy and round-trips."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from multimodal_hand_pose_enhancement_for_sign_language_tpu.ops import rotations as rot


def _random_rotvecs(rng, n=64, max_angle=np.pi - 0.05):
    axes = rng.randn(n, 3)
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    angles = rng.uniform(1e-4, max_angle, size=(n, 1))
    return (axes * angles).astype(np.float32)


def test_aa_to_mat_matches_scipy(rng):
    aa = _random_rotvecs(rng)
    ours = np.asarray(rot.aa_to_mat(aa))
    ref = R.from_rotvec(aa.astype(np.float64)).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_mat_to_aa_matches_scipy(rng):
    aa = _random_rotvecs(rng)
    mats = R.from_rotvec(aa.astype(np.float64)).as_matrix().astype(np.float32)
    ours = np.asarray(rot.mat_to_aa(mats))
    ref = R.from_matrix(mats.astype(np.float64)).as_rotvec()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_mat_to_aa_near_pi_and_zero(rng):
    # angles near pi exercise the quaternion branch selection
    aa = _random_rotvecs(rng, n=32)
    aa = aa / np.linalg.norm(aa, axis=1, keepdims=True) * (np.pi - 1e-4)
    mats = R.from_rotvec(aa.astype(np.float64)).as_matrix().astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(rot.mat_to_aa(mats)),
        R.from_matrix(mats.astype(np.float64)).as_rotvec(),
        atol=1e-4,
    )
    # near-zero angles
    tiny = (rng.randn(16, 3) * 1e-8).astype(np.float32)
    mats = R.from_rotvec(tiny.astype(np.float64)).as_matrix().astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(rot.mat_to_aa(mats)),
        R.from_matrix(mats.astype(np.float64)).as_rotvec(),
        atol=1e-9,
    )


def test_rot6d_layout_matches_reference_formula(rng):
    """rot6d must be the first two matrix COLUMNS (conversion_utils.py:26)."""
    aa = _random_rotvecs(rng, n=8)
    mats = R.from_rotvec(aa.astype(np.float64)).as_matrix().astype(np.float32)
    ours = np.asarray(rot.mat_to_rot6d(mats))
    ref = np.concatenate([mats[..., 0], mats[..., 1]], axis=-1)
    np.testing.assert_allclose(ours, ref, atol=1e-7)


def test_rot6d_to_mat_gram_schmidt_reference_formula(rng):
    """Reproduce the exact epsilon placement of conversion_utils.py:86-107."""
    r6d = rng.randn(32, 6).astype(np.float32)
    ours = np.asarray(rot.rot6d_to_mat(r6d))

    x_raw, y_raw = r6d[:, 0:3], r6d[:, 3:6]
    x = x_raw / (np.linalg.norm(x_raw, ord=2, axis=-1)[:, None] + 1e-6)
    z = np.cross(x, y_raw)
    z = z / (np.linalg.norm(z, ord=2, axis=-1)[:, None] + 1e-6)
    y = np.cross(z, x)
    ref = np.stack([x, y, z], axis=-1)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_aa_rot6d_roundtrip(rng):
    aa = _random_rotvecs(rng).astype(np.float32)
    r6d = np.asarray(rot.aa_to_mat_rot6d(aa))
    back = np.asarray(rot.rot6d_to_aa_vec(r6d))
    np.testing.assert_allclose(back, aa, atol=2e-4)


def test_clip_level_conversions_roundtrip(rng):
    T, n = 12, 48
    aa_clip = _random_rotvecs(rng, n=T * n).reshape(T, n * 3).astype(np.float32)
    r6d_clip = np.asarray(rot.clip_aa_to_rot6d(aa_clip))
    assert r6d_clip.shape == (T, n * 6)
    back = np.asarray(rot.clip_rot6d_to_aa(r6d_clip))
    np.testing.assert_allclose(back, aa_clip, atol=2e-4)


def test_plane_forms_match_stacked_oracle(rng):
    """The lane-friendly component-plane clip converters must equal the
    generic stacked mat/quat path (which is itself scipy-parity-tested),
    including degenerate near-zero and near-pi rotations."""
    import jax.numpy as jnp

    T, n = 9, 48
    aa = _random_rotvecs(rng, n=T * n).astype(np.float32)
    aa[0] = 0.0  # exact zero rotation
    aa[1] = aa[1] / np.linalg.norm(aa[1]) * (np.pi - 1e-5)  # near pi
    aa_clip = aa.reshape(T, n * 3)

    r6d_plane = np.asarray(rot.clip_aa_to_rot6d(aa_clip))
    r6d_oracle = np.asarray(
        rot.aa_to_mat_rot6d(jnp.asarray(aa_clip.reshape(T, n, 3)))
    ).reshape(T, n * 6)
    np.testing.assert_allclose(r6d_plane, r6d_oracle, atol=1e-6)

    aa_plane = np.asarray(rot.clip_rot6d_to_aa(r6d_plane))
    aa_oracle = np.asarray(
        rot.rot6d_to_aa_vec(jnp.asarray(r6d_plane.reshape(T, n, 6)))
    ).reshape(T, n * 3)
    np.testing.assert_allclose(aa_plane, aa_oracle, atol=1e-5)


def test_list_api_matches_clip_api(rng):
    clips = [
        _random_rotvecs(rng, n=5 * 48).reshape(5, 144).astype(np.float32),
        _random_rotvecs(rng, n=7 * 48).reshape(7, 144).astype(np.float32),
    ]
    r6d = rot.aa_to_rot6d(clips)
    assert len(r6d) == 2 and r6d[0].shape == (5, 288) and r6d[1].shape == (7, 288)
    aa_back = rot.rot6d_to_aa(r6d)
    for a, b in zip(aa_back, clips):
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_list_api_accepts_3d_array(rng):
    arr = _random_rotvecs(rng, n=4 * 3 * 48).reshape(4, 3, 144).astype(np.float32)
    r6d = rot.aa_to_rot6d(arr)
    assert isinstance(r6d, list) and len(r6d) == 4


def test_np_compat_wrappers(rng):
    aa = _random_rotvecs(rng, n=4)
    mats = R.from_rotvec(aa).as_matrix()
    flat = rot.np_mat_to_rot6d(mats)
    assert flat.shape == (4, 6)
    back = rot.np_rot6d_to_mat(flat)
    assert back.shape == (4, 9)
    np.testing.assert_allclose(back.reshape(4, 3, 3), mats, atol=1e-5)
    # 1-D input keeps 1-D output (reference behavior)
    assert rot.np_mat_to_rot6d(mats[0].reshape(9)).shape == (6,)
    assert rot.np_rot6d_to_mat(flat[0]).shape == (9,)
