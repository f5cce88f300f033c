#!/usr/bin/env python
"""Error-vs-cycles curve for the lifting filter parity (VERDICT r2 #2).

Runs the TF GradientTape oracle (the reconstruction of the reference's
Keras-3-broken SGD, pose3D.py:93-106) and our closed-form-gradient
filter side by side on the FULL bundled demo sequence (583 frames,
3DposeEstimator/data/demo-sequence.h5) at cycle counts 60 / 300 / 900
(900 = the reference's production count, utils/utils.py:91-92), and
prints the MPJPE at each checkpoint plus the max per-coordinate error.

CPU f32 by default (same operating point as parity_harness).  The
record of a run lives in STATUS.md / TPU_PROBE.json "lifting_cycles".
"""

import json
import os
import sys

import numpy as np

from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils.platform import (
    ensure_platform_from_env,
)

ensure_platform_from_env()

REF = "/root/reference"
CHECKPOINTS = (60, 300, 900)


def main():
    import h5py

    sys.path.append(os.path.join(REF, "3DposeEstimator"))
    import pose2D as ref_pose2D
    import pose2Dto3D as ref_pose2Dto3D
    import skeletalModel as ref_skel

    import tensorflow as tf

    from multimodal_hand_pose_enhancement_for_sign_language_tpu.lifting import (
        filtering,
    )

    with h5py.File(os.path.join(REF, "3DposeEstimator/data/demo-sequence.h5")) as f:
        X = np.array(f.get("20161025_pocasi"), dtype="float32")
    Xx, Xy, Xw = X[:, 0::3], X[:, 1::3], X[:, 2::3]
    Xx, Xy, *_ = ref_pose2D.normalization(Xx, Xy)
    Xx, Xy, Xw = ref_pose2D.prune(
        Xx, Xy, Xw, (0, 1, 2, 3, 4, 5, 6, 7), 0.3, "float32"
    )
    Xx, Xy, Xw = (np.asarray(a, np.float32) for a in (Xx, Xy, Xw))
    T, n_pts = Xx.shape
    rng = np.random.RandomState(1234)
    init = ref_pose2Dto3D.initialization(
        Xx, Xy, Xw, ref_skel.getSkeletalModelStructure(), 0.001, rng, "float32"
    )
    rlines, rrx, rry, rrz, rax, ray, raz, rYx0, rYy0, rYz0 = init

    x = tf.Variable(rYx0)
    y = tf.Variable(rYy0)
    z = tf.Variable(rYz0)
    w = tf.constant(Xw)
    tarx, tary = tf.constant(Xx), tf.constant(Xy)
    opt = tf.keras.optimizers.SGD(learning_rate=20.0)

    results = {"T": int(T)}
    done = 0
    for ck in CHECKPOINTS:
        for _ in range(ck - done):
            with tf.GradientTape() as tape:
                loss = (
                    tf.reduce_sum(
                        w * tf.square(x - tarx) + w * tf.square(y - tary)
                    )
                    / (T * n_pts)
                    + tf.reduce_sum(
                        tf.square(x[:-1] - x[1:])
                        + tf.square(y[:-1] - y[1:])
                        + tf.square(z[:-1] - z[1:])
                    )
                    / ((T - 1) * n_pts)
                )
            opt.apply_gradients(zip(tape.gradient(loss, [x, y, z]), [x, y, z]))
        done = ck
        ref_xyz = np.stack([x.numpy(), y.numpy(), z.numpy()], -1)

        oYx, oYy, oYz = filtering.backpropagation_based_filtering_v2(
            rlines, rrx, rry, rrz, rax, ray, raz, Xx, Xy, Xw,
            None, "float32", learningRate=20.0, nCycles=ck,
        )
        ours = np.stack([np.asarray(oYx), np.asarray(oYy), np.asarray(oYz)], -1)
        mpjpe = float(np.linalg.norm(ours - ref_xyz, axis=-1).mean())
        mx = float(np.abs(ours - ref_xyz).max())
        results[str(ck)] = {"mpjpe": mpjpe, "max_abs": mx}
        print(f"cycles={ck:4d}  MPJPE={mpjpe:.3e}  max_abs={mx:.3e}", flush=True)

    print(json.dumps({"lifting_cycles": results}))


if __name__ == "__main__":
    main()
