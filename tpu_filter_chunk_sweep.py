#!/usr/bin/env python
"""Pallas filter chunk sweep with the raised VMEM budget (the r2 sweep
was capped at chunk=32 by the compiler's default ~16 MB scoped limit;
filter_sgd now budgets VMEM explicitly).  Difference-method timing
(tunnel overhead cancelled).  Appends to TPU_PROBE.json.

Run on the chip:  python tpu_filter_chunk_sweep.py
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
    pallas_kernels,
)

OUT = "TPU_PROBE.json"


def main():
    B, T, n_cycles = 256, 128, 900
    rng = np.random.RandomState(0)
    args = [jnp.asarray(rng.randn(B, T, 50).astype(np.float32)) for _ in range(5)]
    w = jnp.asarray(rng.uniform(0.3, 1.0, size=(B, T, 50)).astype(np.float32))
    mask = jnp.ones((B, T), jnp.float32)

    out = {}
    ref = None
    for chunk in (32, 64, 128, 256):
        f = jax.jit(
            lambda *a, c=chunk: pallas_kernels.filter_sgd(
                *a, learning_rate=20.0, n_cycles=n_cycles, chunk=c
            )
        )
        try:
            x, y, z = f(*args, w, mask)
            s = float(jnp.sum(x) + jnp.sum(y) + jnp.sum(z))
            assert np.isfinite(s)
            if ref is None:
                ref = np.asarray(x)
            else:
                err = float(np.abs(np.asarray(x) - ref).max())
                assert err < 1e-5, f"chunk={chunk} diverges: {err}"
        except Exception as e:  # noqa: BLE001
            out[f"chunk{chunk}_error"] = str(e)[:200]
            continue

        def run(reps):
            t0 = time.perf_counter()
            for _ in range(reps):
                x, y, z = f(*args, w, mask)
            float(jnp.sum(x))
            return time.perf_counter() - t0

        run(1)  # warm
        r1, r2 = 2, 8
        t = (min(run(r2) for _ in range(2)) - min(run(r1) for _ in range(2))) / (
            r2 - r1
        )
        out[f"chunk{chunk}_ms"] = round(t * 1e3, 2)
        out[f"chunk{chunk}_frames_per_s"] = round(B * T / t)
    best = max(
        (v, k) for k, v in out.items() if k.endswith("frames_per_s")
    )
    out["best"] = best[1]

    results = json.load(open(OUT))
    results["filter_chunk_sweep_vmem_raised"] = out
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
