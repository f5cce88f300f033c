"""Native (C++) host-runtime components with Python fallbacks."""

from multimodal_hand_pose_enhancement_for_sign_language_tpu.runtime.native import (  # noqa: F401
    native_available,
    parse_openpose_frame_bytes,
)
