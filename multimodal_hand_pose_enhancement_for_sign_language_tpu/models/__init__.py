"""Functional model zoo: 1D-conv GAN generators, discriminator, classifiers."""

from multimodal_hand_pose_enhancement_for_sign_language_tpu.models.registry import (  # noqa: F401
    MODELS,
    build_generator,
    build_discriminator,
)
