"""Pallas kernel parity (interpret mode on CPU) vs the pure-JAX paths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_hand_pose_enhancement_for_sign_language_tpu.lifting import filtering
from multimodal_hand_pose_enhancement_for_sign_language_tpu.losses.robust import (
    general as robust_general,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.ops import pallas_kernels


def _filter_inputs(rng, B=3, T=40):
    x0 = rng.randn(B, T, 50).astype(np.float32)
    y0 = rng.randn(B, T, 50).astype(np.float32)
    z0 = rng.randn(B, T, 50).astype(np.float32)
    tarx = rng.randn(B, T, 50).astype(np.float32)
    tary = rng.randn(B, T, 50).astype(np.float32)
    w = rng.rand(B, T, 50).astype(np.float32)
    mask = np.ones((B, T), np.float32)
    mask[1, 25:] = 0.0  # one short clip
    w = w * mask[:, :, None]
    return x0, y0, z0, tarx, tary, w, mask


def test_filter_sgd_matches_pure_jax(rng):
    x0, y0, z0, tarx, tary, w, mask = _filter_inputs(rng)
    n_cycles, lr = 25, 20.0
    px, py, pz = pallas_kernels.filter_sgd(
        *(jnp.asarray(a) for a in (x0, y0, z0, tarx, tary, w)),
        jnp.asarray(mask),
        lr,
        n_cycles,
        interpret=True,
    )
    for b in range(x0.shape[0]):
        jx, jy, jz = filtering.filter_xyz(
            x0[b], y0[b], z0[b], tarx[b], tary[b], w[b],
            learning_rate=lr, n_cycles=n_cycles, mask=mask[b],
        )
        np.testing.assert_allclose(np.asarray(px)[b], np.asarray(jx), atol=2e-4)
        np.testing.assert_allclose(np.asarray(py)[b], np.asarray(jy), atol=2e-4)
        np.testing.assert_allclose(np.asarray(pz)[b], np.asarray(jz), atol=2e-4)


def test_filter_matpow_zero_cycles_is_identity(rng):
    """n_cycles=0 (a no-filter baseline) returns the inputs unchanged,
    matching the fori_loop backends."""
    x0, y0, z0, tarx, tary, w, mask = _filter_inputs(rng)
    outs = filtering.filter_xyz_matpow(
        *(jnp.asarray(a) for a in (x0, y0, z0, tarx, tary, w)),
        jnp.asarray(mask), learning_rate=20.0, n_cycles=0,
    )
    for a, b in zip(outs, (x0, y0, z0)):
        np.testing.assert_array_equal(np.asarray(a), b)


@pytest.mark.parametrize("n_cycles", [1, 2, 57, 900])
def test_filter_matpow_matches_iterative(rng, n_cycles):
    """The affine square-and-multiply closed form (filter_xyz_matpow, ~12
    batched MXU matmuls) equals n_cycles iterative SGD steps — including
    masked/bucketed short clips and non-power-of-two cycle counts."""
    x0, y0, z0, tarx, tary, w, mask = _filter_inputs(rng)
    lr = 20.0
    mx, my, mz = filtering.filter_xyz_matpow(
        *(jnp.asarray(a) for a in (x0, y0, z0, tarx, tary, w)),
        jnp.asarray(mask),
        learning_rate=lr,
        n_cycles=n_cycles,
        precision="highest",
    )
    for b in range(x0.shape[0]):
        jx, jy, jz = filtering.filter_xyz(
            x0[b], y0[b], z0[b], tarx[b], tary[b], w[b],
            learning_rate=lr, n_cycles=n_cycles, mask=mask[b],
        )
        np.testing.assert_allclose(np.asarray(mx)[b], np.asarray(jx), atol=3e-4)
        np.testing.assert_allclose(np.asarray(my)[b], np.asarray(jy), atol=3e-4)
        np.testing.assert_allclose(np.asarray(mz)[b], np.asarray(jz), atol=3e-4)


def test_filter_sgd_odd_batch_chunking(rng):
    """Batch not divisible by the chunk size pads cleanly."""
    x0, y0, z0, tarx, tary, w, mask = _filter_inputs(rng, B=5, T=16)
    px, _, _ = pallas_kernels.filter_sgd(
        *(jnp.asarray(a) for a in (x0, y0, z0, tarx, tary, w)),
        jnp.asarray(mask), 20.0, 4, chunk=2, interpret=True,
    )
    assert np.asarray(px).shape == (5, 16, 50)
    assert np.isfinite(np.asarray(px)).all()


def test_robust_lossfun_pallas_matches_reference(rng):
    x = (rng.randn(6, 40) * 2).astype(np.float32)
    for alpha in (0.0, 1.0, 1.7, 2.0, 3.0):
        for scale in (0.5, 1.0):
            ours = np.asarray(
                pallas_kernels.lossfun_pallas(
                    jnp.asarray(x), jnp.float32(alpha), jnp.float32(scale), True
                )
            )
            ref = np.asarray(
                robust_general.lossfun(x, jnp.float32(alpha), jnp.float32(scale))
            )
            np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_robust_lossfun_pallas_gradient(rng):
    x = jnp.asarray((rng.randn(4, 24)).astype(np.float32))
    alpha = jnp.full((1, 24), 1.5, jnp.float32)
    scale = jnp.full((1, 24), 0.7, jnp.float32)

    g_pallas = jax.grad(
        lambda x_: jnp.sum(pallas_kernels.lossfun_pallas(x_, alpha, scale, True))
    )(x)
    g_ref = jax.grad(
        lambda x_: jnp.sum(robust_general.lossfun(x_, alpha, scale))
    )(x)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_ref), rtol=1e-4, atol=1e-6)

    # latent grads route through the jnp reference
    ga = jax.grad(
        lambda a_: jnp.sum(pallas_kernels.lossfun_pallas(x, a_, scale, True))
    )(alpha)
    ga_ref = jax.grad(lambda a_: jnp.sum(robust_general.lossfun(x, a_, scale)))(alpha)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ga_ref), rtol=1e-4, atol=1e-6)


def test_engine_pallas_path_matches_xla_path(rng):
    from multimodal_hand_pose_enhancement_for_sign_language_tpu.lifting import engine

    kp = rng.uniform(100, 500, size=(30, 150)).astype(np.float32)
    kp[:, 2::3] = rng.uniform(0.5, 1.0, size=(30, 50))
    a = engine.lift_clips([kp], n_cycles=10, use_pallas=False)[0]
    b = engine.lift_clips([kp], n_cycles=10, use_pallas=True)[0]
    np.testing.assert_allclose(a, b, atol=2e-4)
