"""The general form of the Barron robust loss, in JAX.

rho(x, alpha, c) from "A General and Adaptive Robust Loss Function"
(Barron, arXiv:1701.03077), with the same special-case selection and
numerical clamps as the reference port (utils/robust_loss/general.py:
28-116): exact closed forms at alpha in {-inf, 0, 2, +inf} and a
machine-epsilon-clamped general branch elsewhere.

Fully elementwise — XLA fuses the whole chain into one VPU pass; a Pallas
kernel variant lives in ops/pallas_kernels.py for the fused loss+grad hot
path.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from multimodal_hand_pose_enhancement_for_sign_language_tpu.losses.robust import util

_MACHINE_EPS = np.finfo(np.float32).eps


def lossfun(x, alpha, scale, approximate: bool = False, epsilon: float = 1e-6):
    """rho(x, alpha, scale); broadcasts alpha/scale against x.

    alpha=-inf: Welsch; -2: Geman-McClure; 0: Cauchy; 1: Charbonnier;
    2: L2.  `approximate` uses the faster appendix form (inaccurate near
    x = alpha = 0).
    """
    x = jnp.asarray(x)
    alpha = jnp.broadcast_to(jnp.asarray(alpha, x.dtype), x.shape)
    scale = jnp.asarray(scale, x.dtype)

    if approximate:
        assert epsilon > _MACHINE_EPS
        b = jnp.abs(alpha - 2) + epsilon
        d = jnp.where(alpha >= 0, alpha + epsilon, alpha - epsilon)
        return (b / d) * (jnp.power((x / scale) ** 2 / b + 1.0, 0.5 * d) - 1.0)

    squared_scaled_x = (x / scale) ** 2

    loss_two = 0.5 * squared_scaled_x
    loss_zero = util.log1p_safe(0.5 * squared_scaled_x)
    loss_neginf = -jnp.expm1(-0.5 * squared_scaled_x)
    loss_posinf = util.expm1_safe(0.5 * squared_scaled_x)

    beta_safe = jnp.maximum(_MACHINE_EPS, jnp.abs(alpha - 2.0))
    alpha_safe = jnp.where(alpha >= 0, 1.0, -1.0) * jnp.maximum(
        _MACHINE_EPS, jnp.abs(alpha)
    )
    loss_otherwise = (beta_safe / alpha_safe) * (
        jnp.power(squared_scaled_x / beta_safe + 1.0, 0.5 * alpha) - 1.0
    )

    return jnp.where(
        alpha == -jnp.inf,
        loss_neginf,
        jnp.where(
            alpha == 0,
            loss_zero,
            jnp.where(
                alpha == 2,
                loss_two,
                jnp.where(alpha == jnp.inf, loss_posinf, loss_otherwise),
            ),
        ),
    )
