"""infer.run_inference batching semantics + bf16 path."""

import numpy as np

import jax

from multimodal_hand_pose_enhancement_for_sign_language_tpu import infer as infer_lib
from multimodal_hand_pose_enhancement_for_sign_language_tpu.models import registry


def _setup(rng, n=10, T=32):
    module = registry.build_generator("v1", 12, 8, default_size=32)
    variables = registry.init_generator(module, jax.random.PRNGKey(0), batch=2, T=T)
    X = rng.randn(n, T, 12).astype(np.float32)
    Y = rng.randn(n, T, 8).astype(np.float32)
    return module, variables, X, Y


def test_partial_final_batch(rng):
    module, variables, X, Y = _setup(rng, n=10)
    out, err = infer_lib.run_inference(
        module, variables, X, batch_size=4, test_Y=Y
    )
    assert out.shape == (10, 32, 8)  # 4 + 4 + 2
    assert np.isfinite(err)


def test_num_samples_cap(rng):
    module, variables, X, Y = _setup(rng, n=10)
    out, _ = infer_lib.run_inference(
        module, variables, X, batch_size=4, num_samples=5
    )
    # the reference stops at the first batch boundary past the cap
    assert out.shape[0] == 8


def test_mesh_inference_matches_single_device(rng):
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from multimodal_hand_pose_enhancement_for_sign_language_tpu.parallel import (
        get_mesh,
    )

    module, variables, X, Y = _setup(rng, n=8)
    single, _ = infer_lib.run_inference(module, variables, X, batch_size=8)
    sharded, _ = infer_lib.run_inference(
        module, variables, X, batch_size=8, mesh=get_mesh(8)
    )
    np.testing.assert_allclose(sharded, single, atol=1e-5)


def test_bf16_close_to_f32(rng):
    module, variables, X, _ = _setup(rng, n=4)
    out32, _ = infer_lib.run_inference(module, variables, X, batch_size=4)
    out16, _ = infer_lib.run_inference(module, variables, X, batch_size=4, bf16=True)
    assert out16.dtype == np.float32
    # bf16 has ~3 decimal digits; outputs are O(1)
    assert np.abs(out16 - out32).max() < 0.15
    assert np.abs(out16 - out32).mean() < 0.02
