#!/usr/bin/env python
"""Benchmark: enhancement throughput (frames/sec/chip) of the flagship
generator (v1, arm2wh, 192-frame windows) vs the PyTorch CPU reference.

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Methodology (corrected this round — see TPU_PROBE.json):
  * K forwards chained on-device inside one jitted program, with the
    FULL mean of each output folded into the carry — a y[:, :, :36]
    slice would let XLA dead-code-eliminate 86% of the final conv's
    output channels (r2 bug, inflated the number).
  * The matmul-precision context wraps the apply INSIDE the traced
    function: jit traces lazily at the first call, so a context around
    the jit definition binds nothing (r2 bug: the "float32-precision"
    bench actually measured DEFAULT 1-bf16-pass precision).
  * K is large enough that the ~31 ms axon-tunnel per-call overhead is
    <2% of a measurement; the torch baseline is timed around bare
    forward calls on in-memory tensors, so neither side pays dispatch.

Operating precision: 'tensorfloat32' (three bf16 MXU passes).  Measured
end-to-end MPJPE vs the torch f32 reference through the save_results
geometry chain: DEFAULT one-pass 5.4e-3 (FAILS the 1e-3 BASELINE
budget), tensorfloat32 ~1e-5 (passes), float32 six-pass 7.6e-7 (passes
at ~1.8x the cost).  tensorfloat32 is the cheapest budget-passing
point, and XLA runs it at ~87% of the 3-pass MXU roofline
(TPU_PROBE.json "whole_forward_tensorfloat32", "mpjpe_by_precision").
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
K = 64
IN_DIM, OUT_DIM = 36, 252
PRECISION = "tensorfloat32"  # cheapest budget-passing point (see module doc)

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
            with jax.default_matmul_precision(PRECISION):  # binds at trace
                y = module.apply(v, carry, None, False)
            # fold the FULL output back into the carry (elision-proof),
            # numerically inert at 1e-30 scale
            return carry + jnp.mean(y) * 1e-30

        return jax.lax.fori_loop(0, K, body, x).mean()

    f = jax.jit(many)
    x = jnp.asarray(np.random.RandomState(0).randn(B, T, IN_DIM).astype(np.float32))
    float(f(variables, x))  # compile + warm (scalar fetch syncs the tunnel)
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        float(f(variables, x))
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
