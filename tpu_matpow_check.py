#!/usr/bin/env python
"""Matpow filter A/B on the chip: the 900-cycle SGD as ~12 batched MXU
matmuls (lifting/filtering.filter_xyz_matpow) vs the VMEM-resident Pallas
kernel (ops/pallas_kernels.filter_sgd), at B=256, T=128 — the same
operating point as TPU_PROBE.json "filter_chunk_sweep_vmem_raised"
(~23.8 ms, 1.38M kernel frames/s).

Reports, per matmul precision (bfloat16 / tensorfloat32 / float32):
  * max abs error vs the Pallas f32 iterative result (the parity gate —
    the lifting oracle budget is ~2e-3 against the TF reference), and
  * difference-method time (K2-K1 chained calls cancels tunnel overhead).

Appends TPU_PROBE.json["filter_matpow"].
Run on the chip:  python tpu_matpow_check.py
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
    filtering,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.ops import (  # noqa: E402
    pallas_kernels,
)

OUT = "TPU_PROBE.json"
B, T, J = 256, 128, 50
LR, CYCLES = 20.0, 900
K1, K2 = 4, 16


def make_inputs():
    rng = np.random.RandomState(0)
    x0 = rng.randn(B, T, J).astype(np.float32)
    y0 = rng.randn(B, T, J).astype(np.float32)
    z0 = rng.randn(B, T, J).astype(np.float32)
    tarx = rng.randn(B, T, J).astype(np.float32)
    tary = rng.randn(B, T, J).astype(np.float32)
    w = rng.rand(B, T, J).astype(np.float32)
    mask = np.ones((B, T), np.float32)
    # bucketed short clips like production
    lens = rng.randint(T // 2, T + 1, size=B)
    for i, L in enumerate(lens):
        mask[i, L:] = 0.0
    w = w * mask[:, :, None]
    return tuple(jnp.asarray(a) for a in (x0, y0, z0, tarx, tary, w, mask))


def diff_time(make_fn, args, reps=3):
    def chain(K):
        def many(*a):
            def body(i, carry):
                outs = make_fn(*a[:5], a[5] + carry * 1e-30, a[6])
                s = sum(jnp.mean(o) for o in outs)
                return carry + s * 1e-30

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

    pallas_fn = jax.jit(
        lambda *a: pallas_kernels.filter_sgd(*a, LR, CYCLES)
    )
    ref = [np.asarray(o) for o in pallas_fn(*args)]
    scale = max(np.abs(r).max() for r in ref)

    res = {"B": B, "T": T, "cycles": CYCLES, "ref": "pallas_f32",
           "ref_scale": float(scale)}
    t_pallas = diff_time(
        lambda *a: pallas_kernels.filter_sgd(*a, LR, CYCLES), args
    )
    res["pallas_ms"] = round(t_pallas * 1e3, 2)
    res["pallas_frames_per_s"] = round(B * T / t_pallas)
    print(json.dumps({"pallas": res["pallas_ms"]}), flush=True)

    for prec in ("bfloat16", "tensorfloat32", "float32"):
        def mp(*a, _p=prec):
            return filtering.filter_xyz_matpow(
                *a, learning_rate=LR, n_cycles=CYCLES, precision=_p
            )

        outs = [np.asarray(o) for o in jax.jit(mp)(*args)]
        err = max(
            float(np.abs(o - r).max()) for o, r in zip(outs, ref)
        )
        t = diff_time(mp, args)
        res[f"matpow_{prec}_ms"] = round(t * 1e3, 2)
        res[f"matpow_{prec}_frames_per_s"] = round(B * T / t)
        res[f"matpow_{prec}_max_abs_err"] = err
        print(
            json.dumps({prec: {"ms": res[f"matpow_{prec}_ms"], "err": err}}),
            flush=True,
        )

    results = json.load(open(OUT))
    results["filter_matpow"] = res
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
