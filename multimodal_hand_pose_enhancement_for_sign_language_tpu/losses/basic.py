"""Mean-reduced elementary losses with PyTorch-default semantics."""

from __future__ import annotations

import jax.numpy as jnp


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred, target):
    return jnp.mean(jnp.square(pred - target))


mse_loss = l2_loss


def huber_loss(pred, target, delta: float = 1.0):
    """nn.HuberLoss(delta): quadratic within delta, linear outside."""
    err = jnp.abs(pred - target)
    quad = 0.5 * jnp.square(err)
    lin = delta * (err - 0.5 * delta)
    return jnp.mean(jnp.where(err <= delta, quad, lin))
