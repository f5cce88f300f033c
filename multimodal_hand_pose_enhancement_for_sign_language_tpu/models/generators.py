"""The five B2H-H2S generator variants and the motion discriminator.

Functional flax re-implementations of the reference model zoo
(/root/reference/modelZoo.py):

  * ``regressor_fcn_bn_32``        (:169-328)  "v1"  — text tiled per frame,
    channel-concat after the encoder,
  * ``regressor_fcn_bn_32_b2h``    (:6-166)    "b2h" — ResNet hand-crop
    features per frame, channel-concat after the encoder,
  * ``regressor_fcn_bn_32_v2``     (:331-440)  "v2"  — text projected to the
    full embed width and concatenated along *time* at the bottleneck,
  * ``regressor_fcn_bn_32_v4``     (:443-554)  "v4"  — conv7 halves channels
    when text is used; text channel-concat at the bottleneck,
  * ``regressor_fcn_bn_32_v4_deeper`` (:557-710) — adds conv8/9/10 and
    skip1/2/3 at the bottleneck (incl. the reference's dead eighth-block
    branch, kept for checkpoint/state parity),
  * ``regressor_fcn_bn_discriminator`` (:763-817) — 7 stride-2 conv blocks
    over motion deltas.

All modules consume (B, T, C) and are wrapped to the reference's (B, D, T)
layout by models.registry.  `train=True` enables dropout + batch-stat
updates ("mutable=['batch_stats'], rngs={'dropout': key}").
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from multimodal_hand_pose_enhancement_for_sign_language_tpu.models.layers import (
    BatchNorm,
    Conv1d,
    ConvBlock,
    ConvTranspose1d,
    FeatEmbedBlock,
    max_pool_time,
    upsample_repeat,
)

TEXT_EMBED_DIM = 512  # CLIP text embedding size (modelZoo.py:184)
IMAGE_FEAT_DIM = 2000  # ResNet-50 features, 1000 per hand (modelZoo.py:21)


class Decoder(nn.Module):
    """Shared decoder tail (modelZoo.py:105-118 / 268-281):
    ConvBlock(k3) -> Dropout -> ConvTranspose(x2 time) -> ReLU -> BN ->
    Dropout -> Conv1d(k7)."""

    out_dim: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool):
        x = ConvBlock(x.shape[-1], 3, 1, 1, dropout=self.dropout)(x, train)
        x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        x = ConvTranspose1d(self.out_dim, 7, stride=2, padding=3, output_padding=1)(x)
        x = nn.relu(x)
        x = BatchNorm()(x, use_running_average=not train)
        x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        x = Conv1d(self.out_dim, 7, 1, 3)(x)
        return x


class regressor_fcn_bn_32(nn.Module):
    """"v1": U-skip 1D conv FCN; optional per-frame text conditioning."""

    feature_in_dim: int
    feature_out_dim: int
    require_text: bool = False
    default_size: int = 256
    dropout_rate: float = 0.5

    def _embed_size(self):
        return self.default_size * (2 if self.require_text else 1)

    @nn.compact
    def __call__(self, x, feats=None, train: bool = False):
        B, T, _ = x.shape
        embed = self._embed_size()

        fourth = ConvBlock(self.default_size, 3, 1, 1, pool=True, dropout=self.dropout_rate, name="encoder")(
            x, train
        )
        if self.require_text:
            # (B, E) -> tile over T -> Linear/BN on (B*T, E) -> maxpool/2
            text = jnp.repeat(feats[:, None, :], T, axis=1).reshape(-1, feats.shape[-1])
            feat = FeatEmbedBlock(
                self.default_size,
                dropout=self.dropout_rate,
                name="text_embeds_postprocess",
            )(text, train).reshape(B, T, self.default_size)
            feat = max_pool_time(feat)
            fourth = jnp.concatenate([fourth, feat], axis=-1)

        fifth = ConvBlock(embed, 3, 1, 1, dropout=self.dropout_rate, name="conv5")(fourth, train)
        sixth = ConvBlock(embed, 3, 1, 1, dropout=self.dropout_rate, name="conv6")(fifth, train)
        seventh = ConvBlock(embed, 5, 2, 2, dropout=self.dropout_rate, name="conv7")(sixth, train)

        sixth = upsample_repeat(seventh, sixth.shape[1]) + sixth
        sixth = ConvBlock(embed, 3, 1, 1, dropout=self.dropout_rate, name="skip4")(sixth, train)
        fifth = sixth + fifth
        fifth = ConvBlock(embed, 3, 1, 1, dropout=self.dropout_rate, name="skip5")(fifth, train)

        return Decoder(self.feature_out_dim, dropout=self.dropout_rate, name="decoder")(fifth, train)


class regressor_fcn_bn_32_b2h(nn.Module):
    """"b2h": same trunk, per-frame ResNet image-feature conditioning."""

    feature_in_dim: int
    feature_out_dim: int
    require_image: bool = False
    default_size: int = 256
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x, feats=None, train: bool = False):
        B, T, _ = x.shape
        embed = self.default_size * (2 if self.require_image else 1)

        # NB: the reference hard-codes 256 encoder channels here
        # (modelZoo.py:31) regardless of default_size — b2h is only
        # shape-consistent at default_size=256; reproduced faithfully.
        fourth = ConvBlock(256, 3, 1, 1, pool=True, dropout=self.dropout_rate, name="encoder")(x, train)
        if self.require_image:
            # feats: (B, T, 2000) per-frame -> Linear/BN -> maxpool/2
            img = feats.reshape(-1, feats.shape[-1])
            feat = FeatEmbedBlock(
                self.default_size,
                dropout=self.dropout_rate,
                name="image_resnet_postprocess",
            )(img, train).reshape(B, T, self.default_size)
            feat = max_pool_time(feat)
            fourth = jnp.concatenate([fourth, feat], axis=-1)

        fifth = ConvBlock(embed, 3, 1, 1, dropout=self.dropout_rate, name="conv5")(fourth, train)
        sixth = ConvBlock(embed, 3, 1, 1, dropout=self.dropout_rate, name="conv6")(fifth, train)
        seventh = ConvBlock(embed, 5, 2, 2, dropout=self.dropout_rate, name="conv7")(sixth, train)

        sixth = upsample_repeat(seventh, sixth.shape[1]) + sixth
        sixth = ConvBlock(embed, 3, 1, 1, dropout=self.dropout_rate, name="skip4")(sixth, train)
        fifth = sixth + fifth
        fifth = ConvBlock(embed, 3, 1, 1, dropout=self.dropout_rate, name="skip5")(fifth, train)

        return Decoder(self.feature_out_dim, dropout=self.dropout_rate, name="decoder")(fifth, train)


class regressor_fcn_bn_32_v2(nn.Module):
    """"v2": text projected to full width, concatenated along TIME at the
    bottleneck — one extra bottleneck step carrying the sentence."""

    feature_in_dim: int
    feature_out_dim: int
    require_text: bool = False
    default_size: int = 256
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x, feats=None, train: bool = False):
        B, T, _ = x.shape
        embed = self.default_size * (2 if self.require_text else 1)

        fourth = ConvBlock(embed, 3, 1, 1, pool=True, dropout=self.dropout_rate, name="encoder")(x, train)
        fifth = ConvBlock(embed, 3, 1, 1, dropout=self.dropout_rate, name="conv5")(fourth, train)
        sixth = ConvBlock(embed, 3, 1, 1, dropout=self.dropout_rate, name="conv6")(fifth, train)
        seventh = ConvBlock(embed, 5, 2, 2, dropout=self.dropout_rate, name="conv7")(sixth, train)

        if self.require_text:
            feat = FeatEmbedBlock(
                embed, dropout=self.dropout_rate, name="text_embeds_postprocess"
            )(feats, train)  # (B, embed)
            seventh = jnp.concatenate([seventh, feat[:, None, :]], axis=1)

        sixth = upsample_repeat(seventh, sixth.shape[1]) + sixth
        sixth = ConvBlock(embed, 3, 1, 1, dropout=self.dropout_rate, name="skip4")(sixth, train)
        fifth = sixth + fifth
        fifth = ConvBlock(embed, 3, 1, 1, dropout=self.dropout_rate, name="skip5")(fifth, train)

        return Decoder(self.feature_out_dim, dropout=self.dropout_rate, name="decoder")(fifth, train)


class regressor_fcn_bn_32_v4(nn.Module):
    """"v4": conv7 halves channels when text is used; text fills the other
    half at the bottleneck (channel concat)."""

    feature_in_dim: int
    feature_out_dim: int
    require_text: bool = False
    default_size: int = 256
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x, feats=None, train: bool = False):
        B, T, _ = x.shape
        embed = self.default_size * (2 if self.require_text else 1)
        bottleneck = embed // (1 + int(self.require_text))

        fourth = ConvBlock(embed, 3, 1, 1, pool=True, dropout=self.dropout_rate, name="encoder")(x, train)
        fifth = ConvBlock(embed, 3, 1, 1, dropout=self.dropout_rate, name="conv5")(fourth, train)
        sixth = ConvBlock(embed, 3, 1, 1, dropout=self.dropout_rate, name="conv6")(fifth, train)
        seventh = ConvBlock(bottleneck, 5, 2, 2, dropout=self.dropout_rate, name="conv7")(sixth, train)

        if self.require_text:
            Tb = seventh.shape[1]
            text = jnp.repeat(feats[:, None, :], Tb, axis=1).reshape(
                -1, feats.shape[-1]
            )
            feat = FeatEmbedBlock(embed // 2, dropout=self.dropout_rate, name="text_embeds_postprocess")(
                text, train
            ).reshape(B, Tb, embed // 2)
            seventh = jnp.concatenate([seventh, feat], axis=-1)

        sixth = upsample_repeat(seventh, sixth.shape[1]) + sixth
        sixth = ConvBlock(embed, 3, 1, 1, dropout=self.dropout_rate, name="skip4")(sixth, train)
        fifth = sixth + fifth
        fifth = ConvBlock(embed, 3, 1, 1, dropout=self.dropout_rate, name="skip5")(fifth, train)

        return Decoder(self.feature_out_dim, dropout=self.dropout_rate, name="decoder")(fifth, train)


class regressor_fcn_bn_32_v4_deeper(nn.Module):
    """"v4_deeper": three extra bottleneck convs and skip1/2/3.

    Faithfully reproduces the reference's dead eighth-block branch
    (modelZoo.py:700-701: skip2's output is computed but unused)."""

    feature_in_dim: int
    feature_out_dim: int
    require_text: bool = False
    default_size: int = 256
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x, feats=None, train: bool = False):
        B, T, _ = x.shape
        embed = self.default_size * (2 if self.require_text else 1)
        bottleneck = embed // (1 + int(self.require_text))

        fourth = ConvBlock(embed, 3, 1, 1, pool=True, dropout=self.dropout_rate, name="encoder")(x, train)
        fifth = ConvBlock(embed, 3, 1, 1, dropout=self.dropout_rate, name="conv5")(fourth, train)
        sixth = ConvBlock(embed, 3, 1, 1, dropout=self.dropout_rate, name="conv6")(fifth, train)
        seventh = ConvBlock(embed, 5, 2, 2, dropout=self.dropout_rate, name="conv7")(sixth, train)

        eighth = ConvBlock(embed, 3, 1, 1, dropout=self.dropout_rate, name="conv8")(seventh, train)
        ninth = ConvBlock(bottleneck, 3, 1, 1, dropout=self.dropout_rate, name="conv9")(eighth, train)
        tenth = ConvBlock(bottleneck, 3, 1, 1, dropout=self.dropout_rate, name="conv10")(ninth, train)

        ninth = tenth + ninth
        if self.require_text:
            Tb = ninth.shape[1]
            text = jnp.repeat(feats[:, None, :], Tb, axis=1).reshape(
                -1, feats.shape[-1]
            )
            feat = FeatEmbedBlock(embed // 2, dropout=self.dropout_rate, name="text_embeds_postprocess")(
                text, train
            ).reshape(B, Tb, embed // 2)
            ninth = jnp.concatenate([ninth, feat], axis=-1)
        ninth = ConvBlock(embed, 3, 1, 1, dropout=self.dropout_rate, name="skip1")(ninth, train)

        eighth = ninth + eighth
        eighth = ConvBlock(embed, 3, 1, 1, dropout=self.dropout_rate, name="skip2")(eighth, train)  # noqa: F841 (dead in reference too)

        sixth = upsample_repeat(seventh, sixth.shape[1]) + sixth
        sixth = ConvBlock(embed, 3, 1, 1, dropout=self.dropout_rate, name="skip3")(sixth, train)
        fifth = sixth + fifth
        fifth = ConvBlock(embed, 3, 1, 1, dropout=self.dropout_rate, name="skip4")(fifth, train)

        return Decoder(self.feature_out_dim, dropout=self.dropout_rate, name="decoder")(fifth, train)


class regressor_fcn_bn_discriminator(nn.Module):
    """Motion discriminator: 7 stride-2 conv blocks D->64->64->32->32->16->
    16->8 then Conv1d(8->1, k3) (modelZoo.py:767-813).  Operates on motion
    deltas; emits a per-position real/fake score map (B, T', 1)."""

    feature_in_dim: int
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, ch in enumerate([64, 64, 32, 32, 16, 16, 8]):
            x = ConvBlock(ch, 5, 2, 2, dropout=self.dropout_rate, name=f"block{i}")(x, train)
        x = nn.Dropout(rate=self.dropout_rate, deterministic=not train)(x)
        x = Conv1d(1, 3, 1, 1, name="final")(x)
        return x
