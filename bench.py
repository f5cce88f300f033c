#!/usr/bin/env python
"""Benchmark: enhancement throughput (frames/sec/chip) of the flagship
generator (v1, arm2wh, 192-frame windows) vs the PyTorch CPU reference.

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Methodology: K eval-mode forwards chained on-device inside one jitted
program (a data dependency between iterations prevents elision), synced
by fetching a scalar to the host — per-dispatch tunnel latency and host
transfers are excluded on both sides (the torch baseline is timed around
bare forward calls on in-memory tensors).  The baseline is measured live
from /root/reference/modelZoo.py when importable; otherwise a recorded
constant from the same host is used.

The forward runs at XLA matmul precision 'float32' — the parity-honest
mode (7.6e-7 MPJPE vs torch through the save_results chain, vs 5.4e-3
at the bf16-pass DEFAULT) measured at the SAME throughput on v5e
(45.0M vs 45.2M frames/s: the model is not MXU-peak-bound), so the
headline loses nothing by meeting the 1e-3 budget
(TPU_MEASURE_r2.json).
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

B = 2048  # TPU batch (throughput-optimal from a 256..2048 sweep)
B_CPU = 256  # torch CPU baseline batch (its throughput is batch-flat)
T = 192
K = 20
IN_DIM, OUT_DIM = 36, 252

# torch CPU reference v1 forward, measured on this host (frames/sec);
# fallback when /root/reference or torch is unavailable at bench time.
RECORDED_CPU_BASELINE = 31_000.0


def measure_tpu() -> float:
    import jax
    import jax.numpy as jnp

    from multimodal_hand_pose_enhancement_for_sign_language_tpu.models import registry

    module = registry.build_generator("v1", IN_DIM, OUT_DIM)
    variables = registry.init_generator(module, jax.random.PRNGKey(0), batch=2, T=T)

    def many(v, x):
        def body(i, carry):
            y = module.apply(v, carry, None, False)
            return carry + 1e-6 * y[:, :, :IN_DIM]

        return jax.lax.fori_loop(0, K, body, x).mean()

    with jax.default_matmul_precision("float32"):
        f = jax.jit(many)
    x = jnp.asarray(np.random.RandomState(0).randn(B, T, IN_DIM).astype(np.float32))
    np.asarray(f(variables, x))  # compile + warm
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        np.asarray(f(variables, x))
        best = min(best, (time.time() - t0) / K)
    return B * T / best


def measure_torch_baseline() -> float:
    try:
        import torch

        sys.path.append("/root/reference")
        import modelZoo  # noqa: F401

        m = modelZoo.regressor_fcn_bn_32()
        m.build_net(IN_DIM, OUT_DIM, require_text=False)
        m.eval()
        x = torch.randn(B_CPU, IN_DIM, T)
        with torch.no_grad():
            m(x)  # warm
            best = np.inf
            for _ in range(2):
                t0 = time.time()
                m(x)
                best = min(best, time.time() - t0)
        return B_CPU * T / best
    except Exception:
        return RECORDED_CPU_BASELINE


def main():
    frames_per_sec = measure_tpu()
    baseline = measure_torch_baseline()
    print(
        json.dumps(
            {
                "metric": "enhancement_throughput",
                "value": round(frames_per_sec, 1),
                "unit": "frames/sec/chip",
                "vs_baseline": round(frames_per_sec / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
