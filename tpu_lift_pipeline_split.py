#!/usr/bin/env python
"""Full lifting pipeline split on the chip: where does a lifted frame's
time go — 2D preprocessing + init3d hypothesis solve + FK snapshot
("init"), vs the 900-cycle Pallas filter?

The r1/r2 headline (176K lifted frames/s at B=256) was measured with
per-call tunnel overhead and cold constants; this re-measures the jitted
`engine._lift_batch` end-to-end and its init-only part with the
difference method (K2-K1 chained iterations, overhead cancelled), at the
production shape B=256, T=128.

Appends TPU_PROBE.json["lift_pipeline_split"].
Run on the chip:  python tpu_lift_pipeline_split.py
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
B, T = 256, 128
K1, K2 = 4, 16


def make_inputs():
    rng = np.random.RandomState(0)
    kps = rng.uniform(100, 500, size=(B, T, 150)).astype(np.float32)
    kps[:, :, 2::3] = rng.uniform(0.5, 1.0, size=(B, T, 50))
    masks = np.ones((B, T), np.float32)
    lens = rng.randint(T // 2, T + 1, size=B)
    for i, L in enumerate(lens):
        masks[i, L:] = 0.0
        kps[i, L:] = 0.0
    noises = np.zeros((B, 3, T), np.float32)
    for i, L in enumerate(lens):
        noises[i, :, :L] = engine._clip_noise(int(L))
    return tuple(jnp.asarray(a) for a in (kps, masks, noises))


def diff_time(fn, args, reps=3):
    """fn(kps, masks, noises) -> tensor(s); chained K times by feeding a
    tiny data-dependent perturbation back into kps (defeats hoisting)."""

    def chain(K):
        def many(kps, masks, noises):
            def body(i, carry):
                outs = fn(kps + carry * 1e-30, masks, noises)
                if not isinstance(outs, (tuple, list)):
                    outs = (outs,)
                return carry + sum(jnp.mean(o) for o in outs) * 1e-30

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
    args = make_inputs()

    def init_only(kps, masks, noises):
        return jax.vmap(engine._init_core)(kps, masks, noises)

    def full(kps, masks, noises):
        return engine._lift_batch(kps, masks, noises, 900, "pallas")

    res = {"B": B, "T": T}
    t_init = diff_time(init_only, args)
    res["init_ms"] = round(t_init * 1e3, 2)
    print(json.dumps({"init_ms": res["init_ms"]}), flush=True)

    t_full = diff_time(full, args)
    res["full_ms"] = round(t_full * 1e3, 2)
    res["filter_share"] = round(1.0 - t_init / t_full, 3)
    res["full_frames_per_s"] = round(B * T / t_full)
    print(json.dumps(res), flush=True)

    results = json.load(open(OUT))
    results["lift_pipeline_split"] = res
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
