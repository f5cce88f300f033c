#!/usr/bin/env python
"""Lifting end-to-end batch-size sweep: frames/s of the full jitted
_lift_batch (init + Pallas filter) at B = 128/256/512/1024, T=128 —
picks lift_clips' default max_batch.  Difference-method timing.

Appends TPU_PROBE.json["lift_batch_sweep"].
Run on the chip:  python tpu_lift_batch_sweep.py
"""

import json
import time

import numpy as np

from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils.platform import (
    ensure_platform_from_env,
)

ensure_platform_from_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodal_hand_pose_enhancement_for_sign_language_tpu.lifting import (  # noqa: E402
    engine,
)

OUT = "TPU_PROBE.json"
T = 128
K1, K2 = 4, 12


def make_inputs(B):
    rng = np.random.RandomState(0)
    kps = rng.uniform(100, 500, size=(B, T, 150)).astype(np.float32)
    kps[:, :, 2::3] = rng.uniform(0.5, 1.0, size=(B, T, 50))
    masks = np.ones((B, T), np.float32)
    noises = np.zeros((B, 3, T), np.float32)
    noises[:, :, :] = engine._clip_noise(T)[None]
    return tuple(jnp.asarray(a) for a in (kps, masks, noises))


def diff_time(fn, args, reps=3):
    def chain(K):
        def many(kps, masks, noises):
            def body(i, carry):
                out = fn(kps + carry * 1e-30, masks, noises)
                return carry + jnp.mean(out) * 1e-30

            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

        return jax.jit(many)

    def best_of(f):
        float(f(*args))
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    return (best_of(chain(K2)) - best_of(chain(K1))) / (K2 - K1)


def main():
    res = {"T": T}
    for B in (128, 256, 512, 1024):
        try:
            t = diff_time(
                lambda k, m, n: engine._lift_batch(k, m, n, 900, "pallas"),
                make_inputs(B),
            )
            res[f"B{B}_ms"] = round(t * 1e3, 2)
            res[f"B{B}_frames_per_s"] = round(B * T / t)
        except Exception as e:  # noqa: BLE001
            res[f"B{B}_error"] = str(e)[:160]
        print(json.dumps({f"B{B}": res.get(f"B{B}_frames_per_s")}), flush=True)

    results = json.load(open(OUT))
    results["lift_batch_sweep"] = res
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
