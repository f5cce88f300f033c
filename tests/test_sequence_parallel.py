"""Time-sharded lifting filter vs the single-device reference path."""

import numpy as np
import pytest

import jax

from multimodal_hand_pose_enhancement_for_sign_language_tpu.lifting import filtering
from multimodal_hand_pose_enhancement_for_sign_language_tpu.parallel import (
    get_mesh,
    sequence,
)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_time_sharded_filter_matches_single_device(rng):
    T, n = 64, 50
    x0 = rng.randn(T, n).astype(np.float32)
    y0 = rng.randn(T, n).astype(np.float32)
    z0 = rng.randn(T, n).astype(np.float32)
    tarx = rng.randn(T, n).astype(np.float32)
    tary = rng.randn(T, n).astype(np.float32)
    w = rng.rand(T, n).astype(np.float32)

    ref = filtering.filter_xyz(
        x0, y0, z0, tarx, tary, w, learning_rate=20.0, n_cycles=50
    )
    mesh = get_mesh(8)
    out = sequence.filter_xyz_time_sharded(
        x0, y0, z0, tarx, tary, w, mesh, learning_rate=20.0, n_cycles=50
    )
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_time_sharded_long_clip(rng):
    """A 'video-level' length clip (grouped data is 1920 frames in the
    reference) spread over 4 devices."""
    T, n = 1920, 50
    x0 = rng.randn(T, n).astype(np.float32)
    tar = rng.randn(T, n).astype(np.float32)
    w = rng.rand(T, n).astype(np.float32)
    mesh = get_mesh(4)
    x, y, z = sequence.filter_xyz_time_sharded(
        x0, x0, x0, tar, tar, w, mesh, n_cycles=10
    )
    assert np.asarray(x).shape == (T, n)
    assert np.isfinite(np.asarray(x)).all()
