"""Model registry and (B, D, T) boundary adapters.

The reference exposes models through ``MODELS[short_name] -> class name``
(utils/constants.py:45-51) with a (B, D, T) channels-first layout.  TPU
models here are channels-last internally; these adapters transpose once at
the boundary so entry points stay drop-in compatible.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from multimodal_hand_pose_enhancement_for_sign_language_tpu.models import generators
from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils.constants import (
    MODELS as _MODEL_NAMES,
)

MODELS = dict(_MODEL_NAMES)

_CLASSES = {
    "regressor_fcn_bn_32": generators.regressor_fcn_bn_32,
    "regressor_fcn_bn_32_b2h": generators.regressor_fcn_bn_32_b2h,
    "regressor_fcn_bn_32_v2": generators.regressor_fcn_bn_32_v2,
    "regressor_fcn_bn_32_v4": generators.regressor_fcn_bn_32_v4,
    "regressor_fcn_bn_32_v4_deeper": generators.regressor_fcn_bn_32_v4_deeper,
}


def resolve(model: str) -> str:
    """Short name or full class name -> full class name."""
    return MODELS.get(model, model)


def build_generator(
    model: str,
    feature_in_dim: int,
    feature_out_dim: int,
    require_text: bool = False,
    require_image: bool = False,
    default_size: int = 256,
    dropout_rate: float = 0.5,
):
    """Instantiate a generator module (reference build_net equivalent).

    `dropout_rate` defaults to the reference's hard-coded Dropout(0.5);
    0.0 gives a dropout-free model (used by the train-step parity harness
    and for ablations) with an identical parameter tree.
    """
    name = resolve(model)
    cls = _CLASSES[name]
    if name == "regressor_fcn_bn_32_b2h":
        return cls(
            feature_in_dim=feature_in_dim,
            feature_out_dim=feature_out_dim,
            require_image=require_image,
            default_size=default_size,
            dropout_rate=dropout_rate,
        )
    return cls(
        feature_in_dim=feature_in_dim,
        feature_out_dim=feature_out_dim,
        require_text=require_text,
        default_size=default_size,
        dropout_rate=dropout_rate,
    )


def build_discriminator(feature_out_dim: int, dropout_rate: float = 0.5):
    return generators.regressor_fcn_bn_discriminator(
        feature_in_dim=feature_out_dim, dropout_rate=dropout_rate
    )


def needs_feats(module) -> bool:
    return bool(
        getattr(module, "require_text", False)
        or getattr(module, "require_image", False)
    )


def init_generator(module, rng, batch=2, T=192, feats_dim=None):
    """Initialize variables with dummy shapes.  Returns a FrozenDict with
    'params' and 'batch_stats' collections."""
    x = jnp.zeros((batch, T, module.feature_in_dim), jnp.float32)
    feats = None
    if needs_feats(module):
        if getattr(module, "require_image", False):
            feats = jnp.zeros(
                (batch, T, feats_dim or generators.IMAGE_FEAT_DIM), jnp.float32
            )
        else:
            feats = jnp.zeros(
                (batch, feats_dim or generators.TEXT_EMBED_DIM), jnp.float32
            )
    return module.init({"params": rng}, x, feats, False)


def init_discriminator(module, rng, batch=2, T=191):
    x = jnp.zeros((batch, T, module.feature_in_dim), jnp.float32)
    return module.init({"params": rng}, x, False)


def apply_bdt(module, variables, x_bdt, feats=None, train=False, dropout_rng=None):
    """Apply a model to (B, D, T) input, returning (B, D_out, T) output.

    In train mode also returns the updated batch_stats collection:
    (y, new_batch_stats); in eval mode just y.
    """
    x = jnp.swapaxes(x_bdt, 1, 2)
    if train:
        y, mut = module.apply(
            variables,
            x,
            feats,
            True,
            mutable=["batch_stats"],
            rngs={"dropout": dropout_rng},
        )
        return jnp.swapaxes(y, 1, 2), mut["batch_stats"]
    y = module.apply(variables, x, feats, False)
    return jnp.swapaxes(y, 1, 2)


def apply_disc_bdt(module, variables, x_bdt, train=False, dropout_rng=None):
    """Discriminator variant of apply_bdt (no feats argument)."""
    x = jnp.swapaxes(x_bdt, 1, 2)
    if train:
        y, mut = module.apply(
            variables,
            x,
            True,
            mutable=["batch_stats"],
            rngs={"dropout": dropout_rng},
        )
        return jnp.swapaxes(y, 1, 2), mut["batch_stats"]
    y = module.apply(variables, x, False)
    return jnp.swapaxes(y, 1, 2)
