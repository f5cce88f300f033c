#!/usr/bin/env python
"""A/B the lifting engine's dispatch-ahead queue through the tunnel.

Round-3 change: lift_clips dispatches batches ahead and fetches behind
(MHPE_LIFT_PREFETCH in-flight, default 3).  The first article-scale
rerun (TPU_PROBE "article_lifting") measured SLOWER than the r2 serial
run (1176 s vs 671 s warm) — but on a different day through a shared
tunnel, so this script measures depth=0 (serial control) vs depth=3
back-to-back on the same data and chip, interleaved A/B/A/B to cancel
tunnel drift.  Appends TPU_PROBE.json["lift_prefetch_ab"].

Run on the chip:  python tpu_lift_prefetch_ab.py [n_clips] [reps]
"""

import json
import os
import sys
import time

import numpy as np

from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils.platform import (
    ensure_platform_from_env,
)

ensure_platform_from_env()

OUT = "TPU_PROBE.json"


def make_clips(n):
    rng = np.random.RandomState(0)
    lens = rng.randint(60, 231, size=n)
    clips = []
    for L in lens:
        kp = rng.uniform(100.0, 500.0, size=(L, 150)).astype(np.float32)
        kp[:, 2::3] = rng.uniform(0.5, 1.0, size=(L, 50))
        clips.append(kp)
    return clips, int(lens.sum())


def main(n_clips=4000, reps=2):
    from multimodal_hand_pose_enhancement_for_sign_language_tpu.lifting import (
        engine,
    )

    clips, total_frames = make_clips(n_clips)
    print(f"{n_clips} clips, {total_frames} frames", flush=True)

    # warm the compiles once (not timed)
    os.environ["MHPE_LIFT_PREFETCH"] = "0"
    engine.lift_clips(clips[:256], max_batch=1024)

    walls = {"0": [], "3": []}
    for _ in range(reps):
        for depth in ("0", "3"):
            os.environ["MHPE_LIFT_PREFETCH"] = depth
            t0 = time.perf_counter()
            out = engine.lift_clips(clips, max_batch=1024)
            walls[depth].append(round(time.perf_counter() - t0, 1))
            assert np.isfinite(out[0]).all()
            print(f"depth={depth}: {walls[depth][-1]}s", flush=True)

    res = {
        "n_clips": n_clips,
        "total_frames": total_frames,
        "wall_s_depth0": walls["0"],
        "wall_s_depth3": walls["3"],
        "median_depth0": float(np.median(walls["0"])),
        "median_depth3": float(np.median(walls["3"])),
    }
    res["speedup_depth3"] = round(res["median_depth0"] / res["median_depth3"], 3)
    print(json.dumps(res), flush=True)

    results = json.load(open(OUT))
    results["lift_prefetch_ab"] = res
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 4000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 2,
    )
