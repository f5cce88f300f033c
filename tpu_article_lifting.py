#!/usr/bin/env python
"""Article-scale lifting: the full 31,128-clip train-split 2D->3D lifting
stage (the reference's most expensive preprocessing computation —
Pool(24) x [normalize -> prune -> init -> 900-step TF SGD],
utils/utils.py:120-137) run end-to-end through engine.lift_clips on one
chip, against a live baseline: the reference's TF filter loop
(pose3D.py:93-104 semantics, GradientTape + SGD(20), 900 cycles) timed
on this host for one average clip.

The baseline is GENEROUS to the reference: it counts only the filter
stage (the reference's per-frame Python-loop init is extra) and is
scaled by its Pool(24) parallelism.

Writes TPU_PROBE.json["article_lifting"].
Run on the chip:  python tpu_article_lifting.py [n_clips]
"""

import json
import sys
import time

import numpy as np

from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils.platform import (
    ensure_platform_from_env,
)

ensure_platform_from_env()

OUT = "TPU_PROBE.json"
N_CLIPS = 31128
T_RANGE = (60, 230)


def make_clips(n):
    rng = np.random.RandomState(0)
    lens = rng.randint(T_RANGE[0], T_RANGE[1] + 1, size=n)
    clips = []
    for L in lens:
        kp = rng.uniform(100.0, 500.0, size=(L, 150)).astype(np.float32)
        kp[:, 2::3] = rng.uniform(0.5, 1.0, size=(L, 50))
        clips.append(kp)
    return clips, int(lens.sum())


def tf_filter_baseline(T=145, n_cycles=900):
    """Reference filter semantics (pose3D.py:93-104) on this host's CPU;
    returns frames/sec for one process."""
    import tensorflow as tf

    rng = np.random.RandomState(0)
    n_points = 50
    x = tf.Variable(rng.randn(T, n_points).astype(np.float32))
    y = tf.Variable(rng.randn(T, n_points).astype(np.float32))
    z = tf.Variable(rng.randn(T, n_points).astype(np.float32))
    w = tf.constant(rng.rand(T, n_points).astype(np.float32))
    tarx = tf.constant(rng.randn(T, n_points).astype(np.float32))
    tary = tf.constant(rng.randn(T, n_points).astype(np.float32))
    lines = tf.constant(rng.randn(25).astype(np.float32))
    opt = tf.keras.optimizers.SGD(learning_rate=20.0)

    def run(cycles):
        t0 = time.perf_counter()
        for _ in range(cycles):
            with tf.GradientTape() as tape:
                loss = (
                    tf.reduce_sum(
                        w * tf.square(x - tarx) + w * tf.square(y - tary)
                    )
                    / (T * n_points)
                    + tf.reduce_sum(
                        tf.square(x[: T - 1] - x[1:])
                        + tf.square(y[: T - 1] - y[1:])
                        + tf.square(z[: T - 1] - z[1:])
                    )
                    / ((T - 1) * n_points)
                    + tf.reduce_sum(tf.exp(lines))
                )
            grads = tape.gradient(loss, [x, y, z])
            opt.apply_gradients(zip(grads, [x, y, z]))
        return time.perf_counter() - t0

    run(5)  # warm
    secs = run(60) * (n_cycles / 60.0)
    return T / secs  # frames per second for the full 900-cycle filter


def main(n_clips=N_CLIPS):
    from multimodal_hand_pose_enhancement_for_sign_language_tpu.lifting import (
        engine,
    )

    clips, total_frames = make_clips(n_clips)
    print(f"{n_clips} clips, {total_frames} frames", flush=True)

    t0 = time.perf_counter()
    out = engine.lift_clips(clips, max_batch=1024)
    cold_s = time.perf_counter() - t0
    assert all(np.isfinite(o).all() for o in out[:50])

    t0 = time.perf_counter()
    out = engine.lift_clips(clips, max_batch=1024)
    warm_s = time.perf_counter() - t0

    tf_fps = tf_filter_baseline()
    # honest accounting: through the axon dev tunnel this run is
    # host<->device BANDWIDTH bound (~10 GB of padded keypoints up +
    # results down at ~15 MB/s), not compute bound — the device-resident
    # rate is 1.38M frames/s (TPU_PROBE.json "lift_pipeline_split"), i.e.
    # ~3.3 s of device time for this dataset on a normally-attached TPU.
    approx_io_gb = round(
        2 * sum(-(-c.shape[0] // 64) * 64 * 150 * 4 for c in clips) / 1e9, 1
    )
    res = {
        "n_clips": n_clips,
        "total_frames": total_frames,
        "cold_wall_s": round(cold_s, 1),
        "warm_wall_s": round(warm_s, 1),
        "frames_per_s_warm": round(total_frames / warm_s),
        "approx_tunnel_io_gb": approx_io_gb,
        "device_compute_s_at_resident_rate": round(total_frames / 1.38e6, 1),
        "bound_by": "axon tunnel host<->device bandwidth, not device compute",
        "tf_baseline_frames_per_s_1proc": round(tf_fps, 1),
        "tf_baseline_est_hours_pool24": round(
            total_frames / (tf_fps * 24) / 3600, 2
        ),
        "speedup_vs_pool24_filter_only": round(
            (total_frames / warm_s) / (tf_fps * 24), 1
        ),
    }
    print(json.dumps(res), flush=True)

    # append to the run history (wall-clock varies with shared-tunnel
    # load, so runs are kept side by side rather than overwritten);
    # the run key names the configuration under test
    import os

    run_key = os.environ.get("MHPE_LIFT_RUN_KEY", "latest")
    results = json.load(open(OUT))
    entry = results.get("article_lifting", {})
    runs = entry.get("runs", {})
    run = {
        k: res[k]
        for k in (
            "cold_wall_s", "warm_wall_s", "frames_per_s_warm",
            "approx_tunnel_io_gb", "tf_baseline_frames_per_s_1proc",
            "tf_baseline_est_hours_pool24", "speedup_vs_pool24_filter_only",
        )
    }
    run["prefetch_depth"] = int(os.environ.get("MHPE_LIFT_PREFETCH", "3"))
    runs[run_key] = run
    results["article_lifting"] = {
        "n_clips": res["n_clips"],
        "total_frames": res["total_frames"],
        "device_compute_s_at_resident_rate":
            res["device_compute_s_at_resident_rate"],
        "bound_by": "axon dev-tunnel host<->device bandwidth, not device "
                    "compute; wall-clock varies with tunnel load (see runs)",
        "runs": runs,
    }
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else N_CLIPS)
