"""FK/IK tests: xyz -> aa -> xyz round trip on the 49-bone tree, plus
golden-value checks of the reference NumPy formulas."""

import numpy as np

from multimodal_hand_pose_enhancement_for_sign_language_tpu.ops import (
    kinematics as kin,
    skeleton,
)


def _reference_aa_to_xyz(aa_clip, root, bone_len, structure):
    """Direct NumPy transcription of the reference FK formula
    (conversion_utils.py:117-137), used as a golden oracle."""
    T = aa_clip.shape[0]
    xyz = np.empty((T, aa_clip.shape[1] + 6), dtype="float32")
    xyz[:, 0:6] = root
    for iBone in range(1, len(structure)):
        j, e, _, b = structure[iBone]
        p_j = xyz[:, j * 3 : j * 3 + 3]
        p_b = xyz[:, b * 3 : b * 3 + 3]
        u = p_j - p_b
        u = u / np.linalg.norm(u, axis=1)[:, None]
        aa = aa_clip[:, (iBone - 1) * 3 : (iBone - 1) * 3 + 3]
        th = np.linalg.norm(aa, axis=1)
        a = aa / th[:, None]
        v = (
            u * np.cos(th)[:, None]
            + np.cross(a, u) * np.sin(th)[:, None]
            + a * np.einsum("ij,ij->i", a, u)[:, None] * (1 - np.cos(th))[:, None]
        )
        xyz[:, (iBone + 1) * 3 : (iBone + 1) * 3 + 3] = p_j + bone_len[iBone] * v
    return xyz


def _make_plausible_xyz(rng, T=6):
    """Build a random but well-conditioned pose by running FK on random
    axis-angles, so IK -> FK round trips are meaningful."""
    structure = skeleton.get_skeletal_model_structure()
    n_bones = len(structure)
    aa = rng.uniform(0.2, 1.2, size=(T, (n_bones - 1) * 3)).astype(np.float32)
    root = np.array([0.0, 0.0, 0.0, 0.0, 1.0, 0.0], dtype=np.float32)
    bone_len = rng.uniform(0.5, 1.5, size=(n_bones,)).astype(np.float32)
    xyz = _reference_aa_to_xyz(aa, root, bone_len, structure)
    return xyz, aa, root, bone_len, structure


def test_fk_matches_reference_formula(rng):
    xyz_ref, aa, root, bone_len, structure = _make_plausible_xyz(rng)
    ours = kin.clip_aa_to_xyz(aa, root, bone_len)
    assert not np.any(np.isnan(xyz_ref))
    np.testing.assert_allclose(np.asarray(ours), xyz_ref, rtol=1e-4, atol=1e-4)


def test_ik_fk_roundtrip(rng):
    xyz, _, root, bone_len, structure = _make_plausible_xyz(rng)
    aa = kin.clip_xyz_to_aa(np.asarray(xyz))
    # reconstruct with bone lengths measured from the pose itself
    lens = kin.get_bone_length([xyz], structure)
    xyz_back = kin.clip_aa_to_xyz(np.asarray(aa), root, lens)
    # IK loses the component of rotation about the parent direction, but the
    # FK formula only ever rotates the parent direction, so positions must
    # round-trip.
    np.testing.assert_allclose(np.asarray(xyz_back), xyz, rtol=2e-3, atol=2e-3)


def test_bone_length_invariance_under_fk(rng):
    _, aa, root, bone_len, structure = _make_plausible_xyz(rng)
    xyz = np.asarray(kin.clip_aa_to_xyz(aa, root, bone_len))
    lens = kin.get_bone_length([xyz], structure)
    # bone 0 is the root bone whose length is whatever `root` encodes
    np.testing.assert_allclose(lens[1:], bone_len[1:], rtol=1e-3)


def test_get_root_bone(rng):
    clips = [rng.randn(5, 150).astype(np.float32), rng.randn(3, 150).astype(np.float32)]
    root = kin.get_root_bone(clips)
    stacked = np.vstack([c[:, 0:6] for c in clips])
    np.testing.assert_allclose(root, stacked.mean(axis=0), rtol=1e-5, atol=1e-6)


def test_list_apis(rng):
    _, aa, root, bone_len, structure = _make_plausible_xyz(rng)
    out = kin.aa_to_xyz([aa, aa[:3]], root, bone_len, structure)
    assert len(out) == 2 and out[0].shape == (6, 150) and out[1].shape == (3, 150)
    back = kin.xyz_to_aa(out, structure)
    assert back[0].shape == (6, 144)
