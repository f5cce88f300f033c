"""Inference pipeline: batched enhancement forward + results persistence.

Re-design of the reference inference path:
  * `run_inference`   — inference.py:90-126: batched eval-mode forward
    with L1 accounting; here one jitted program, batches sharded over the
    device mesh (replacing nn.DataParallel, inference.py:45-47),
  * `save_results`    — utils/utils.py:388-427: writes r6d/aa/xyz pickles
    (+ root.pkl / bone_len.pkl) with the exact same file contract, using
    the batched geometry ops instead of Pool(24) scipy loops.
"""

from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_hand_pose_enhancement_for_sign_language_tpu.data import (
    windows as win_lib,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.data.io import (
    load_binary,
    mkdir,
    save_binary,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.ops import (
    kinematics,
    rotations,
    skeleton,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils.constants import (
    FEATURE_MAP,
)


def run_inference(
    module,
    variables,
    test_X,
    test_feats=None,
    batch_size: int = 128,
    num_samples: int = 3000,
    test_Y=None,
    mesh=None,
    bf16: bool = False,
    matmul_precision: str = "tensorfloat32",
):
    """Eval-mode batched forward over (N, T, D) inputs.

    Returns (output (M, T, Dout), mean L1 error vs test_Y or None).
    Mirrors the reference's batching incl. the partial final batch and the
    num_samples cap (inference.py:96-123).  `bf16` runs the model compute
    in bfloat16 (outputs cast back to f32).

    `matmul_precision`: XLA matmul/conv precision for the forward.  On
    TPU the XLA DEFAULT lowers f32 matmuls to ONE bf16 MXU pass, which
    measures ~5e-3 MPJPE vs the torch reference through the save_results
    geometry chain — outside the 1e-3 BASELINE budget.  The default
    'tensorfloat32' (three bf16 passes) measures 4.0e-5 — inside the
    budget with a 25x margin at ~1.8x the speed of 'float32' (six
    passes, 7.6e-7); see TPU_PROBE.json "mpjpe_by_precision" and
    "whole_forward_*".  Pass 'bfloat16' to trade parity for throughput.
    """
    if bf16:
        variables = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
            else a,
            variables,
        )

    @jax.jit
    def fwd(x, feats):
        # The precision context must be live while jit TRACES the body —
        # tracing happens lazily at the first call, so a context wrapped
        # around the `@jax.jit` definition alone binds nothing (r2 bug:
        # inference silently ran at DEFAULT 1-bf16-pass precision).
        # Inside the traced function it binds unconditionally.
        with jax.default_matmul_precision(matmul_precision):
            if bf16:
                x = x.astype(jnp.bfloat16)
                feats = feats.astype(jnp.bfloat16) if feats is not None else None
            return module.apply(variables, x, feats, False).astype(jnp.float32)

    def to_device(a):
        """Shard full batches over the mesh 'data' axis (the multi-chip
        replacement for nn.DataParallel, reference inference.py:45-47)."""
        if (
            mesh is not None
            and mesh.devices.size > 1
            and a.shape[0] % mesh.shape["data"] == 0
        ):
            from multimodal_hand_pose_enhancement_for_sign_language_tpu.parallel import (
                shard_batch,
            )

            return shard_batch(jnp.asarray(a), mesh)
        return jnp.asarray(a)

    outputs = []
    error = 0.0
    total_steps = 0
    n = min(test_X.shape[0], num_samples)
    for start in range(0, n, batch_size):
        end = min(start + batch_size, test_X.shape[0])
        x = to_device(test_X[start:end])
        f = None if test_feats is None else to_device(test_feats[start:end])
        y = np.asarray(fwd(x, f))
        outputs.append(y)
        total_steps += 1
        if test_Y is not None:
            error += float(np.mean(np.abs(y - test_Y[start:end]))) * batch_size
    output = np.concatenate(outputs, axis=0)
    mean_err = error / max(total_steps * batch_size, 1) if test_Y is not None else None
    return output, mean_err


# save_results derives root/bone_len from the FULL train xyz pickle on
# every call (utils/utils.py:400-410 recomputes them per invocation); the
# derivation is a pure function of that file, so one in-process memo entry
# keyed by (path, mtime, size) makes per-split/per-config save_results
# calls skip the ~GB-scale reload+equalize of a 31k-clip split.  The
# root.pkl/bone_len.pkl dump-to-cwd file contract is preserved per call.
_ROOT_BONE_CACHE: dict = {}


def _train_root_bone(data_dir, structure):
    path = os.path.abspath(os.path.join(data_dir, "xyz_train.pkl"))
    st = os.stat(path)
    key = (path, st.st_mtime_ns, st.st_size)
    if key not in _ROOT_BONE_CACHE:
        xyz_train = load_binary(path)
        xyz_train = win_lib.make_equal_len(xyz_train, method="cutting+reflect")
        xyz_train, _, _ = win_lib.rmv_clips_nan(xyz_train)
        root = kinematics.get_root_bone(xyz_train, structure)
        bone_len = kinematics.get_bone_length(xyz_train, structure)
        assert not np.any(np.isnan(root))
        assert not np.any(np.isnan(bone_len))
        _ROOT_BONE_CACHE.clear()  # at most one entry; values are tiny
        _ROOT_BONE_CACHE[key] = (root, bone_len)
    return _ROOT_BONE_CACHE[key]


def save_results(
    input_windows,
    output_windows,
    pipeline: str,
    base_path: str,
    data_dir: str,
    tag: str = "",
    infer_set: str = "",
):
    """Write r6d/aa/xyz pickles for enhanced sequences.

    `input_windows`/`output_windows` are (N, T, D) r6d arrays (original
    scale).  File contract identical to utils/utils.py:388-427.
    """
    feats = pipeline.split("2")
    out_feat = feats[1]
    res_dir = f"results_{tag}/"
    mkdir(os.path.join(base_path, res_dir))
    assert not np.any(np.isnan(input_windows))
    assert not np.any(np.isnan(output_windows))
    if not (pipeline in FEATURE_MAP or out_feat in ("wh", "fingerL")):
        return None

    if pipeline in ("arm_wh2wh", "wh2wh"):
        input_windows = input_windows[:, :, : 6 * 6]  # keep arms

    filename = os.path.join(base_path, f"{res_dir}/r6d_{infer_set}")
    save_binary(np.concatenate((input_windows, output_windows), axis=2), filename)

    input_aa = np.array(rotations.rot6d_to_aa(input_windows))
    output_aa = np.array(rotations.rot6d_to_aa(output_windows))
    assert not np.any(np.isnan(input_aa))
    assert not np.any(np.isnan(output_aa))
    filename = os.path.join(base_path, f"{res_dir}/aa_{infer_set}")
    save_binary(np.concatenate((input_aa, output_aa), axis=2), filename)

    structure = skeleton.get_skeletal_model_structure()
    root, bone_len = _train_root_bone(data_dir, structure)
    with open("root.pkl", "wb") as handle:
        pickle.dump(root, handle, protocol=pickle.HIGHEST_PROTOCOL)
    with open("bone_len.pkl", "wb") as handle:
        pickle.dump(bone_len, handle, protocol=pickle.HIGHEST_PROTOCOL)

    input_output_aa = load_binary(
        os.path.join(base_path, f"{res_dir}/aa_{infer_set}.pkl")
    )
    assert not np.any(np.isnan(input_output_aa))
    input_output_xyz = kinematics.aa_to_xyz(input_output_aa, root, bone_len, structure)
    assert not np.any(np.isnan(input_output_xyz))
    filename = os.path.join(base_path, f"{res_dir}/xyz_{infer_set}")
    save_binary(input_output_xyz, filename)
    return filename + ".pkl"
