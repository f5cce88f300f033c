"""The adaptive robust loss: per-dimension latent alpha and scale.

Functional JAX port of utils/robust_loss/adaptive.py:51-198.  The latents
live in a plain pytree (`AdaptiveLossFunction.init()`), constrained by
affine-sigmoid (alpha in (alpha_lo, alpha_hi), init alpha_init) and
affine-softplus (scale in (scale_lo, inf), init scale_init).

Reference behavioral quirk, reproduced by the trainer: train_gan.py:69
passes only generator.parameters() to Adam, so these latents are created
but never optimized — the effective loss is the fixed alpha=2, c=0.5 NLL.
The latents are still real parameters here; whether they are trained is
the optimizer's decision, exactly as in the reference.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp
import numpy as np

from multimodal_hand_pose_enhancement_for_sign_language_tpu.losses.robust import (
    distribution as _distribution,
    util,
)


@dataclass
class AdaptiveLossFunction:
    num_dims: int
    alpha_lo: float = 1.0
    alpha_hi: float = 4.0
    alpha_init: Optional[float] = 2.0
    scale_lo: float = 1e-5
    scale_init: float = 0.5

    def __post_init__(self):
        if not self.alpha_lo >= 0:
            raise ValueError(f"`alpha_lo` must be >= 0, but is {self.alpha_lo}")
        if not self.alpha_hi >= self.alpha_lo:
            raise ValueError(
                f"`alpha_hi` = {self.alpha_hi} must be >= `alpha_lo` = {self.alpha_lo}"
            )
        if (
            self.alpha_init is not None
            and self.alpha_lo != self.alpha_hi
            and not (self.alpha_lo < self.alpha_init < self.alpha_hi)
        ):
            raise ValueError(
                f"`alpha_init` = {self.alpha_init} must be in "
                f"({self.alpha_lo}, {self.alpha_hi})"
            )
        if not self.scale_lo > 0:
            raise ValueError(f"`scale_lo` must be > 0, but is {self.scale_lo}")
        if not self.scale_init >= self.scale_lo:
            raise ValueError(
                f"`scale_init` = {self.scale_init} must be >= `scale_lo` = {self.scale_lo}"
            )
        self.distribution = _distribution.Distribution()

    def init(self) -> dict:
        """Latent parameter pytree: {'latent_alpha', 'latent_scale'}."""
        params = {}
        if self.alpha_lo != self.alpha_hi:
            a_init = (
                (self.alpha_lo + self.alpha_hi) / 2.0
                if self.alpha_init is None
                else self.alpha_init
            )
            latent = np.asarray(
                util.inv_affine_sigmoid(a_init, lo=self.alpha_lo, hi=self.alpha_hi)
            )
            params["latent_alpha"] = jnp.full((1, self.num_dims), latent, jnp.float32)
        if self.scale_lo != self.scale_init:
            params["latent_scale"] = jnp.zeros((1, self.num_dims), jnp.float32)
        return params

    def alpha(self, params: dict):
        if self.alpha_lo == self.alpha_hi:
            return jnp.full((1, self.num_dims), self.alpha_lo, jnp.float32)
        return util.affine_sigmoid(
            params["latent_alpha"], lo=self.alpha_lo, hi=self.alpha_hi
        )

    def scale(self, params: dict):
        if self.scale_lo == self.scale_init:
            return jnp.full((1, self.num_dims), self.scale_init, jnp.float32)
        return util.affine_softplus(
            params["latent_scale"], lo=self.scale_lo, ref=self.scale_init
        )

    def lossfun(self, x, params: Optional[dict] = None):
        """NLL per element of (batch, num_dims) residuals."""
        if params is None:
            params = self.init()
        x = jnp.asarray(x)
        assert x.ndim == 2 and x.shape[1] == self.num_dims
        return self.distribution.nllfun(x, self.alpha(params), self.scale(params))
