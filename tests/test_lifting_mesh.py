"""Mesh-sharded lifting (shard_map over clips) vs single-device."""

import numpy as np
import pytest

import jax

from multimodal_hand_pose_enhancement_for_sign_language_tpu.lifting import engine
from multimodal_hand_pose_enhancement_for_sign_language_tpu.parallel import get_mesh


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_mesh_sharded_lifting_matches(rng):
    kp = rng.uniform(100, 500, size=(30, 150)).astype(np.float32)
    kp[:, 2::3] = rng.uniform(0.5, 1.0, size=(30, 50))
    clips = [kp, kp[:20], kp[:25]]
    single = engine.lift_clips(clips, n_cycles=15, use_pallas=False)
    mesh = get_mesh(8)
    sharded = engine.lift_clips(clips, n_cycles=15, use_pallas=False, mesh=mesh)
    for a, b in zip(single, sharded):
        np.testing.assert_allclose(a, b, atol=1e-6)
    # pallas filter under shard_map (interpret mode on CPU)
    sharded_p = engine.lift_clips(clips, n_cycles=15, use_pallas=True, mesh=mesh)
    for a, b in zip(single, sharded_p):
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_matpow_filter_impl_matches_xla(rng):
    """The engine's 'matpow' backend (MXU closed form) equals the XLA
    fori_loop through the full lift pipeline, incl. bucketing."""
    kp = rng.uniform(100, 500, size=(30, 150)).astype(np.float32)
    kp[:, 2::3] = rng.uniform(0.5, 1.0, size=(30, 50))
    clips = [kp, kp[:20], kp[:25]]
    xla = engine.lift_clips(clips, n_cycles=15, filter_impl="xla")
    mp = engine.lift_clips(clips, n_cycles=15, filter_impl="matpow")
    for a, b in zip(xla, mp):
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_matpow_long_clip_guard(rng):
    """matpow materializes (B, J, T, T): long-clip buckets must be
    rejected loudly instead of OOMing the chip (ADVICE r2)."""
    import pytest

    kp = rng.uniform(100, 500, size=(engine.MATPOW_MAX_T + 64, 150)).astype(
        np.float32
    )
    kp[:, 2::3] = rng.uniform(0.5, 1.0, size=(kp.shape[0], 50))
    with pytest.raises(ValueError, match="matpow"):
        engine.lift_clips([kp], n_cycles=2, filter_impl="matpow")
