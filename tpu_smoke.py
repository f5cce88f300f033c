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

    # 1b. segmented-filter path (output tuple > 20 MB forces the batch
    # split across pallas calls) agrees with the XLA loop on IDENTICAL
    # filter inputs.  (Comparing through the full lift pipeline instead
    # would mix in compute_b's discrete hypothesis ties, which amplify
    # program-fusion-level f32 noise into ~1e-4 coordinate flips.)
    from multimodal_hand_pose_enhancement_for_sign_language_tpu.lifting import (
        filtering,
    )
    from multimodal_hand_pose_enhancement_for_sign_language_tpu.ops import (
        pallas_kernels,
    )

    Bf, Tf = 400, 40  # outputs 3 x 400*50*128*4 = 30.7 MB -> segments
    fx = [jnp.asarray(rng.randn(Bf, Tf, 50).astype(np.float32))
          for _ in range(5)]
    fw = jnp.asarray(rng.rand(Bf, Tf, 50).astype(np.float32))
    fm = jnp.ones((Bf, Tf), jnp.float32)
    px, py, pz = pallas_kernels.filter_sgd(*fx, fw, fm, 20.0, 20)
    jx, jy, jz = jax.vmap(
        lambda a, b, c, tx, ty, w, m: filtering.filter_xyz(
            a, b, c, tx, ty, w, learning_rate=20.0, n_cycles=20, mask=m
        )
    )(*fx, fw, fm)
    diff = max(
        float(jnp.abs(p - j).max())
        for p, j in ((px, jx), (py, jy), (pz, jz))
    )
    check("pallas_filter_segmented", diff < 1e-4, f"max diff {diff:.2e}")

    # 1c. plane-form r6d<->aa converters vs the stacked oracle, compiled
    from multimodal_hand_pose_enhancement_for_sign_language_tpu.ops import (
        rotations,
    )

    aa_clip = (0.3 * rng.randn(16, 48 * 3)).astype(np.float32)
    r6d_plane = np.asarray(rotations.clip_aa_to_rot6d(jnp.asarray(aa_clip)))
    r6d_oracle = np.asarray(
        rotations.aa_to_mat_rot6d(jnp.asarray(aa_clip.reshape(16, 48, 3)))
    ).reshape(16, 48 * 6)
    d1 = float(np.abs(r6d_plane - r6d_oracle).max())
    aa_plane = np.asarray(rotations.clip_rot6d_to_aa(jnp.asarray(r6d_plane)))
    aa_oracle = np.asarray(
        rotations.rot6d_to_aa_vec(jnp.asarray(r6d_plane.reshape(16, 48, 6)))
    ).reshape(16, 48 * 3)
    d2 = float(np.abs(aa_plane - aa_oracle).max())
    check("plane_conversions_vs_stacked", max(d1, d2) < 1e-4,
          f"r6d {d1:.2e} aa {d2:.2e}")

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
