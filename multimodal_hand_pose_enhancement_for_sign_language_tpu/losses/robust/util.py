"""Numerically-safe helpers and latent-parameter bijectors (JAX).

JAX re-implementation of the Barron robust-loss helper math
(reference utils/robust_loss/util.py:27-106): clamped log/exp and the
affine-sigmoid / affine-softplus bijectors used to constrain the adaptive
loss's latent alpha and scale.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def log_safe(x):
    return jnp.log(jnp.minimum(x, 33e37))


def log1p_safe(x):
    return jnp.log1p(jnp.minimum(x, 33e37))


def exp_safe(x):
    return jnp.exp(jnp.minimum(x, 87.5))


def expm1_safe(x):
    return jnp.expm1(jnp.minimum(x, 87.5))


def inv_softplus(y):
    y = jnp.asarray(y)
    return jnp.where(y > 87.5, y, jnp.log(jnp.expm1(y)))


def logit(y):
    return -jnp.log(1.0 / y - 1.0)


def affine_sigmoid(logits, lo=0.0, hi=1.0):
    """Maps reals to (lo, hi); 0 maps to (lo+hi)/2."""
    if not lo < hi:
        raise ValueError(f"`lo` ({lo}) must be < `hi` ({hi})")
    return jnp.asarray(1.0 / (1.0 + jnp.exp(-jnp.asarray(logits)))) * (hi - lo) + lo


def inv_affine_sigmoid(probs, lo=0.0, hi=1.0):
    if not lo < hi:
        raise ValueError(f"`lo` ({lo}) must be < `hi` ({hi})")
    return logit((jnp.asarray(probs) - lo) / (hi - lo))


def _softplus(x):
    return jnp.logaddexp(x, 0.0)


def affine_softplus(x, lo=0.0, ref=1.0):
    """Maps reals to (lo, inf); 0 maps to ref."""
    if not lo < ref:
        raise ValueError(f"`lo` ({lo}) must be < `ref` ({ref})")
    shift = inv_softplus(jnp.asarray(1.0))
    return (ref - lo) * _softplus(jnp.asarray(x) + shift) + lo


def inv_affine_softplus(y, lo=0.0, ref=1.0):
    if not lo < ref:
        raise ValueError(f"`lo` ({lo}) must be < `ref` ({ref})")
    shift = inv_softplus(jnp.asarray(1.0))
    return inv_softplus((jnp.asarray(y) - lo) / (ref - lo)) - shift


def students_t_nll(x, df, scale):
    """NLL of a Generalized Student's T (reference util.py:109-118)."""
    import jax.scipy.special as jsp

    x, df, scale = jnp.asarray(x), jnp.asarray(df), jnp.asarray(scale)
    log_partition = (
        jnp.log(jnp.abs(scale))
        + jsp.gammaln(0.5 * df)
        - jsp.gammaln(0.5 * df + 0.5)
        + 0.5 * np.log(np.pi)
    )
    return (
        0.5 * ((df + 1.0) * jnp.log1p((x / scale) ** 2.0 / df) + jnp.log(df))
        + log_partition
    )
