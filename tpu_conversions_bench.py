#!/usr/bin/env python
"""save_results conversion-chain throughput on the chip: batched
r6d -> aa (rotations, one-shot vectorized) and aa -> xyz (48-bone FK
scan, joint-major layout) — the stages the reference ran as
Pool(24)-of-scipy per bone group (conversion_utils.py:51-56,117-137).

Difference-method timing at B=256 clips x T=192 frames.  Appends
TPU_PROBE.json["conversion_chain"].
Run on the chip:  python tpu_conversions_bench.py
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

from multimodal_hand_pose_enhancement_for_sign_language_tpu.ops import (  # noqa: E402
    kinematics,
    rotations,
)

OUT = "TPU_PROBE.json"
B, T = 256, 192
K1, K2 = 4, 16


def diff_time(fn, args, reps=3):
    def chain(K):
        def many(x, *rest):
            def body(i, carry):
                out = fn(x + carry * 1e-30, *rest)
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
    rng = np.random.RandomState(0)
    aa = (0.3 * rng.randn(B, T, 48 * 3)).astype(np.float32)
    root = np.zeros((6,), np.float32)
    root[4] = 1.0
    bone_len = rng.uniform(0.8, 1.2, size=(49,)).astype(np.float32)

    r6d = jnp.asarray(
        np.asarray(jax.vmap(rotations.clip_aa_to_rot6d)(jnp.asarray(aa)))
    )
    aa_j = jnp.asarray(aa)
    root_j = jnp.asarray(root)
    len_j = jnp.asarray(bone_len)

    res = {"B": B, "T": T, "frames": B * T}

    t = diff_time(lambda x: jax.vmap(rotations.clip_rot6d_to_aa)(x), (r6d,))
    res["r6d_to_aa_ms"] = round(t * 1e3, 2)
    res["r6d_to_aa_frames_per_s"] = round(B * T / t)
    print(json.dumps({"r6d_to_aa_ms": res["r6d_to_aa_ms"]}), flush=True)

    t = diff_time(
        lambda x, r, L: jax.vmap(lambda c: kinematics.clip_aa_to_xyz(c, r, L))(x),
        (aa_j, root_j, len_j),
    )
    res["aa_to_xyz_ms"] = round(t * 1e3, 2)
    res["aa_to_xyz_frames_per_s"] = round(B * T / t)
    print(json.dumps(res), flush=True)

    results = json.load(open(OUT))
    results["conversion_chain"] = res
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
