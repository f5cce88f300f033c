"""Multi-host helpers (single-process semantics) + grad-flow hook."""

import numpy as np
import pytest

import jax

from multimodal_hand_pose_enhancement_for_sign_language_tpu.parallel import (
    get_mesh,
    multihost,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.train.gan import (
    GanConfig,
    GanTrainer,
)


def test_initialize_single_process_noop():
    assert multihost.initialize() is False  # no coordinator configured


def test_local_batch_slice_single_host():
    # single process owns the whole batch
    s = multihost.local_batch_slice(32)
    assert (s.start, s.stop) == (0, 32)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_global_batch_array_sharding(rng):
    mesh = get_mesh(8)
    x = rng.randn(16, 4).astype(np.float32)
    arr = multihost.global_batch_array(x, mesh)
    assert arr.shape == (16, 4)
    np.testing.assert_array_equal(np.asarray(arr), x)
    assert len(arr.sharding.device_set) == 8


def test_grad_flow_hook(rng):
    cfg = GanConfig(
        feature_in_dim=12, feature_out_dim=24, default_size=32, window_t=32
    )
    tr = GanTrainer(cfg)
    state = tr.init_state()
    x = rng.randn(4, 32, 12).astype(np.float32)
    y = rng.randn(4, 32, 24).astype(np.float32)
    stats = tr.grad_flow(state, x, y)
    assert any(k.endswith("kernel") for k in stats)
    assert all(np.isfinite(v["max"]) for v in stats.values())
