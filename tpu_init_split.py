#!/usr/bin/env python
"""Fine-grained split of the lifting pipeline's pre-filter stage (75% of
end-to-end lift time per TPU_PROBE.json "lift_pipeline_split"): which of
normalization/prune, bone-length medians (25 sorts), the 49-bone computeB
scan, and the FK snapshot carries the 63 ms?

Difference-method timing at B=256, T=128.  Appends
TPU_PROBE.json["init_split"].  Run on the chip:  python tpu_init_split.py
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
    filtering,
    init3d,
    pose2d,
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


def prep(kp, mask):
    Xx = kp[:, 0::3]
    Xy = kp[:, 1::3]
    Xw = kp[:, 2::3]
    Xx, Xy, _, _, _ = pose2d.normalization(Xx, Xy, mask=mask)
    Xx, Xy, Xw = pose2d.prune(
        Xx, Xy, Xw, engine._PRUNE_WATCH, engine._PRUNE_THRESHOLD
    )
    return Xx * mask[:, None], Xy * mask[:, None], Xw * mask[:, None]


def main():
    args = make_inputs()

    def stage_prep(kps, masks, noises):
        return jax.vmap(prep)(kps, masks)

    def stage_medians(kps, masks, noises):
        Xx, Xy, Xw = jax.vmap(prep)(kps, masks)
        return jax.vmap(lambda x, y, m: init3d.bone_length_classes(x, y, mask=m))(
            Xx, Xy, masks
        )

    def stage_init(kps, masks, noises):
        Xx, Xy, Xw = jax.vmap(prep)(kps, masks)
        outs = jax.vmap(
            lambda x, y, w, nz, m: init3d.initialization(
                x, y, w, engine._NOISE_SIGMA, noise=nz, mask=m
            )
        )(Xx, Xy, Xw, noises, masks)
        return outs[:7]

    def stage_full_init(kps, masks, noises):
        return jax.vmap(engine._init_core)(kps, masks, noises)

    res = {"B": B, "T": T}
    for name, fn in (
        ("prep_ms", stage_prep),
        ("prep_plus_medians_ms", stage_medians),
        ("prep_plus_init_ms", stage_init),
        ("full_init_ms", stage_full_init),
    ):
        res[name] = round(diff_time(fn, args) * 1e3, 2)
        print(json.dumps({name: res[name]}), flush=True)

    results = json.load(open(OUT))
    results["init_split"] = res
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
