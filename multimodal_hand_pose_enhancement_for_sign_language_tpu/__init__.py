"""TPU-native multimodal hand-pose enhancement framework for sign language.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of the
"B2H-H2S" reference codebase (Body2Hands applied to How2Sign): 2D->3D
skeletal lifting, 6D-rotation geometry, a 1D-convolutional GAN hand-pose
enhancer with text/image conditioning, a Barron adaptive robust loss, the
full multimodal data pipeline, and a downstream topic classifier.

Design stance (not a port):
  * every numeric path is jit-compiled and batched with `vmap`,
  * multi-device scaling uses `jax.sharding.Mesh` + NamedSharding/shard_map
    with XLA collectives over ICI (no per-clip process pools, no
    DataParallel),
  * hot elementwise chains have Pallas TPU kernels,
  * models are functional flax modules in NLC (batch, time, channel) layout
    so the channel dim rides the TPU lane dimension.

Import alias convention: ``import
multimodal_hand_pose_enhancement_for_sign_language_tpu as mhpe``.
"""

__version__ = "0.1.0"

from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils import constants  # noqa: F401


def __getattr__(name):
    """Lazy top-level API: mhpe.lift_2d_to_3d, mhpe.build_generator, ...

    Submodules import lazily so `import mhpe` stays cheap (no jax/flax
    import until a model or lifting symbol is touched).
    """
    import importlib

    _API = {
        "lift_2d_to_3d": ("lifting.engine", "lift_2d_to_3d"),
        "lift_clips": ("lifting.engine", "lift_clips"),
        "build_generator": ("models.registry", "build_generator"),
        "build_discriminator": ("models.registry", "build_discriminator"),
        "load_windows": ("data.windows", "load_windows"),
        "save_results": ("infer", "save_results"),
        "run_inference": ("infer", "run_inference"),
        "GanTrainer": ("train.gan", "GanTrainer"),
        "GanConfig": ("train.gan", "GanConfig"),
        "get_mesh": ("parallel.mesh", "get_mesh"),
    }
    if name in _API:
        mod_name, attr = _API[name]
        mod = importlib.import_module(f"{__name__}.{mod_name}")
        return getattr(mod, attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
