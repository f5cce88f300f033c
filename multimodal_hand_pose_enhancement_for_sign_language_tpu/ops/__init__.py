"""Geometry core: skeletal tree, rotation representations, kinematics."""

from multimodal_hand_pose_enhancement_for_sign_language_tpu.ops.skeleton import (  # noqa: F401
    get_skeletal_model_structure,
    getSkeletalModelStructure,
    structure_stats,
    structureStats,
    STRUCTURE,
    N_BONES,
    N_JOINTS,
    N_LENGTH_CLASSES,
)
