#!/usr/bin/env python
"""On-chip smoke validation — runs the TPU-specific paths the CPU test
suite can't: compiled Pallas kernels vs their XLA twins, the fused robust
loss in the trainer, and a training + forward step.  Prints one PASS/FAIL
line per check; exits non-zero on any failure.

Usage: python tpu_smoke.py   (on a host with a real TPU attached)
"""

import sys

import numpy as np

from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils.platform import (
    ensure_platform_from_env,
)

ensure_platform_from_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

FAILED = []


def check(name, ok, detail=""):
    print(f"{'PASS' if ok else 'FAIL'}  {name}  {detail}", flush=True)
    if not ok:
        FAILED.append(name)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.RandomState(0)

    # 1. Pallas filter vs XLA loop, compiled
    from multimodal_hand_pose_enhancement_for_sign_language_tpu.lifting import engine

    kp = rng.uniform(100, 500, size=(40, 150)).astype(np.float32)
    kp[:, 2::3] = rng.uniform(0.5, 1.0, size=(40, 50))
    a = engine.lift_clips([kp], n_cycles=100, use_pallas=False)[0]
    b = engine.lift_clips([kp], n_cycles=100, use_pallas=True)[0]
    diff = float(np.abs(a - b).max())
    check("pallas_filter_vs_xla", diff < 1e-4, f"max diff {diff:.2e}")

    # 2. fused robust loss vs jnp path in the trainer
    from multimodal_hand_pose_enhancement_for_sign_language_tpu.train.gan import (
        GanConfig,
        GanTrainer,
    )

    cfg = GanConfig(
        feature_in_dim=12, feature_out_dim=24, default_size=32, window_t=32,
        loss="RobustLoss", batch_size=4,
    )
    x = jnp.asarray(rng.randn(4, 32, 12).astype(np.float32))
    y = jnp.asarray(rng.randn(4, 32, 24).astype(np.float32))
    tr1 = GanTrainer(cfg)
    check("fused_robust_enabled", tr1._fused_robust, "")
    s1 = tr1.init_state()
    _, l1 = tr1._g_step(s1, x, y, None)
    tr2 = GanTrainer(cfg)
    tr2._fused_robust = False
    s2 = tr2.init_state()
    _, l2 = tr2._g_step(s2, x, y, None)
    diff = abs(float(l1) - float(l2))
    check("fused_robust_vs_jnp", diff < 1e-4, f"loss diff {diff:.2e}")

    # 3. forward throughput sanity (very loose floor)
    import time

    from multimodal_hand_pose_enhancement_for_sign_language_tpu.models import registry

    module = registry.build_generator("v1", 36, 252)
    variables = registry.init_generator(module, jax.random.PRNGKey(0), batch=2, T=192)
    B, K = 512, 10

    def many(v, xx):
        def body(i, carry):
            yy = module.apply(v, carry, None, False)
            return carry + 1e-6 * yy[:, :, :36]

        return jax.lax.fori_loop(0, K, body, xx).mean()

    f = jax.jit(many)
    xx = jnp.asarray(rng.randn(B, 192, 36).astype(np.float32))
    float(np.asarray(f(variables, xx)))
    t0 = time.time()
    float(np.asarray(f(variables, xx)))
    fps = B * 192 / ((time.time() - t0) / K)
    check("forward_throughput", fps > 1e6, f"{fps:,.0f} frames/s")

    # 4. one full f32 training step finiteness
    cfg2 = GanConfig(batch_size=8)
    tr3 = GanTrainer(cfg2)
    s3 = tr3.init_state()
    xb = jnp.asarray(rng.randn(8, 192, 36).astype(np.float32))
    yb = jnp.asarray(rng.randn(8, 192, 252).astype(np.float32))
    s3, gl = tr3._g_step(s3, xb, yb, None)
    s3, dl = tr3._d_step(s3, xb, yb, None)
    check(
        "train_step_finite",
        np.isfinite(float(gl)) and np.isfinite(float(dl)),
        f"g {float(gl):.3f} d {float(dl):.3f}",
    )

    if FAILED:
        print(f"FAILED: {FAILED}", flush=True)
        sys.exit(1)
    print("ALL PASS", flush=True)


if __name__ == "__main__":
    main()
