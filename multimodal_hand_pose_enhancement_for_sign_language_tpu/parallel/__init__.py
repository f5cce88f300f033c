"""Device-mesh and sharding utilities (SPMD over ICI)."""

from multimodal_hand_pose_enhancement_for_sign_language_tpu.parallel.mesh import (  # noqa: F401
    get_mesh,
    shard_batch,
    replicate,
    pad_to_multiple,
)
