"""2D->3D skeletal lifting engine (vectorized, batched, jitted)."""

from multimodal_hand_pose_enhancement_for_sign_language_tpu.lifting.engine import (  # noqa: F401
    lift_clip,
    lift_2d_to_3d,
)
