#!/usr/bin/env python
"""Single-clip 2D->3D lifting demo — working replacement for the
reference's stale 3DposeEstimator/demo.py (which calls a removed filtering
function and mis-unpacks `normalization`; see SURVEY.md).

Pipeline (reference demo.py:27-92): load h5 -> normalization -> prune ->
interpolation -> initialization -> backpropagation-based filtering (v2,
the only variant that exists) -> save intermediate txt dumps.

Runs the whole numeric path as jitted XLA on the available backend.
"""

import argparse
import os

import numpy as np

from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils.platform import (
    ensure_platform_from_env,
)

ensure_platform_from_env()

import jax.numpy as jnp  # noqa: E402

from multimodal_hand_pose_enhancement_for_sign_language_tpu.lifting import (  # noqa: E402
    engine,
    filtering,
    init3d,
    pose2d,
)

REF_DEMO_H5 = "/root/reference/3DposeEstimator/data/demo-sequence.h5"


def save(fname, lst):
    """Reference demo.py:15-23 txt dump format."""
    T, dim = lst[0].shape
    with open(fname, "w") as f:
        for t in range(T):
            for i in range(dim):
                for j in range(len(lst)):
                    f.write("%e\t" % lst[j][t, i])
            f.write("\n")


def load_sequence(path: str, key=None) -> np.ndarray:
    import h5py

    with h5py.File(path, "r") as f:
        key = key or list(f.keys())[0]
        return np.array(f.get(key), dtype="float32")


def main(args):
    out_dir = args.out_dir
    os.makedirs(out_dir, exist_ok=True)

    if args.input and os.path.exists(args.input):
        X = load_sequence(args.input)
    elif os.path.exists(REF_DEMO_H5):
        X = load_sequence(REF_DEMO_H5)
    else:
        print("no input h5 found; generating a synthetic sequence", flush=True)
        rng = np.random.RandomState(0)
        X = rng.uniform(100, 500, size=(64, 150)).astype("float32")
        X[:, 2::3] = rng.uniform(0.5, 1.0, size=(64, 50))
    if args.max_frames:
        X = X[: args.max_frames]
    print(f"sequence: {X.shape}", flush=True)

    Xx, Xy, Xw = X[:, 0::3], X[:, 1::3], X[:, 2::3]

    Xx, Xy, mux, muy, sigma = pose2d.normalization(jnp.asarray(Xx), jnp.asarray(Xy))
    save(os.path.join(out_dir, "demo1.txt"), [np.asarray(Xx), np.asarray(Xy), Xw])

    Xx, Xy, Xw = pose2d.prune(Xx, Xy, jnp.asarray(Xw), (0, 1, 2, 3, 4, 5, 6, 7), 0.3)
    save(os.path.join(out_dir, "demo2.txt"), [np.asarray(Xx), np.asarray(Xy), np.asarray(Xw)])

    Xx, Xy, Xw = pose2d.interpolation(Xx, Xy, Xw, 0.99)
    save(os.path.join(out_dir, "demo3.txt"), [np.asarray(Xx), np.asarray(Xy), np.asarray(Xw)])

    noise = engine._clip_noise(Xx.shape[0])
    lines0, rx0, ry0, rz0, ax0, ay0, az0, Yx0, Yy0, Yz0 = init3d.initialization(
        Xx, Xy, Xw, 0.001, noise=noise
    )
    save(
        os.path.join(out_dir, "demo4.txt"),
        [np.asarray(Yx0), np.asarray(Yy0), np.asarray(Yz0)],
    )

    Yx, Yy, Yz = filtering.backpropagation_based_filtering_v2(
        lines0, rx0, ry0, rz0, ax0, ay0, az0, Xx, Xy, Xw,
        learningRate=args.learning_rate, nCycles=args.n_cycles,
    )
    save(
        os.path.join(out_dir, "demo5.txt"),
        [np.asarray(Yx), np.asarray(Yy), np.asarray(Yz)],
    )
    print(f"wrote demo1..demo5 txt dumps to {out_dir}", flush=True)
    return np.asarray(Yx), np.asarray(Yy), np.asarray(Yz)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", type=str, default="", help="input .h5 2D sequence (default: reference demo-sequence.h5 if present)")
    parser.add_argument("--out_dir", type=str, default="demo_out", help="directory for demo txt dumps")
    parser.add_argument("--max_frames", type=int, default=0, help="truncate the sequence (0 = full)")
    parser.add_argument("--n_cycles", type=int, default=900, help="filtering SGD steps")
    parser.add_argument("--learning_rate", type=float, default=20.0, help="filtering SGD learning rate")
    args = parser.parse_args()
    main(args)
