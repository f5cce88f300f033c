#!/usr/bin/env python
"""Round-2 on-TPU measurements (VERDICT r1 items 5 & 6).

Phases (each appends to TPU_MEASURE_r2.json as it lands, so partial runs
still report):
  1. D-step A/B: fused (vmapped fake+real pass) vs sequential two-pass,
     plus the G step, at the article config (v1 arm2wh, B=256, T=192).
  2. bf16 end-to-end MPJPE: bf16 forward vs the torch f32 reference
     through the full save_results geometry chain (r6d -> aa -> xyz),
     against the 1e-3 BASELINE budget.
  3. Article-scale MEASURED training run: 31,128 train / 1,741 val
     windows resident in HBM, 200 epochs, batch 256, D every 3rd epoch,
     val at half batch — the reference's 2 h / 200 epochs config
     (article §4.1.3).

Run on the real chip:  python tpu_round2_measure.py [--skip-article]
"""

import argparse
import json
import time

import numpy as np

from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils.platform import (
    ensure_platform_from_env,
)

ensure_platform_from_env()

OUT = "TPU_MEASURE_r2.json"
RESULTS: dict = {}


def emit(key, value):
    RESULTS[key] = value
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(json.dumps({key: value}), flush=True)


def phase_steps():
    import jax
    import jax.numpy as jnp

    from multimodal_hand_pose_enhancement_for_sign_language_tpu.train.gan import (
        GanConfig,
        GanTrainer,
    )

    B, T, DIN, DOUT = 256, 192, 36, 252
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, DIN).astype(np.float32))
    y = jnp.asarray(rng.randn(B, T, DOUT).astype(np.float32))

    out = {}
    for name, fused in (("fused", True), ("sequential", False)):
        tr = GanTrainer(GanConfig(batch_size=B, fused_d=fused))
        state = tr.init_state()
        state, loss = tr._d_step(state, x, y, None)  # compile
        float(loss)
        K = 20
        t0 = time.perf_counter()
        for _ in range(K):
            state, loss = tr._d_step(state, x, y, None)
        float(loss)  # sync through the tunnel
        dt = (time.perf_counter() - t0) / K
        out[f"d_step_ms_{name}"] = round(dt * 1e3, 3)
        if fused:  # G step once, on the fused trainer
            state, loss = tr._g_step(state, x, y, None)
            float(loss)
            t0 = time.perf_counter()
            for _ in range(K):
                state, loss = tr._g_step(state, x, y, None)
            float(loss)
            out["g_step_ms"] = round((time.perf_counter() - t0) / K * 1e3, 3)
    out["d_step_speedup"] = round(
        out["d_step_ms_sequential"] / out["d_step_ms_fused"], 3
    )
    emit("steps_B256", out)


def phase_bf16_mpjpe():
    """bf16 forward vs torch f32 through r6d->aa->xyz (MPJPE budget 1e-3)."""
    import sys

    import jax.numpy as jnp
    import torch

    sys.path.append("/root/reference")
    import modelZoo as ref_zoo

    from multimodal_hand_pose_enhancement_for_sign_language_tpu.models import (
        registry,
        torch_port,
    )
    from multimodal_hand_pose_enhancement_for_sign_language_tpu.ops import (
        kinematics,
        rotations,
        skeleton,
    )

    B, T, DIN, DOUT = 8, 192, 36, 252
    torch.manual_seed(0)
    m = ref_zoo.regressor_fcn_bn_32()
    m.build_net(DIN, DOUT, require_text=False)
    m.eval()
    rng = np.random.RandomState(0)
    # standardized-scale inputs (what the model sees in production)
    x = (0.5 * rng.randn(B, DIN, T)).astype(np.float32)
    with torch.no_grad():
        ref_out = m(torch.from_numpy(x)).numpy()  # (B, DOUT, T)
    variables = torch_port.generator_from_torch_state(
        {k: v.numpy() for k, v in m.state_dict().items()}
    )
    module = registry.build_generator("v1", DIN, DOUT)

    # forwards: f32 at XLA-default matmul precision (single bf16 MXU
    # pass), f32 at 'float32' precision (bf16x6 passes, true-f32
    # accurate), and bf16 params/activations
    import jax

    def fwd(dtype, precision):
        cast = lambda t: jax.tree.map(
            lambda a: jnp.asarray(a, dtype)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
            else jnp.asarray(a),
            t,
        )
        xb = jnp.swapaxes(jnp.asarray(x, dtype), 1, 2)
        with jax.default_matmul_precision(precision):
            y = jax.jit(
                lambda v, xb: module.apply(v, xb, None, False)
            )(cast(variables), xb)
        return np.asarray(y.swapaxes(1, 2).astype(jnp.float32))

    outs = {
        "f32_default": fwd(jnp.float32, "bfloat16"),
        "f32_highest": fwd(jnp.float32, "float32"),
        "bf16": fwd(jnp.bfloat16, "bfloat16"),
    }

    # full save_results geometry chain on (arms + hands) r6d
    structure = skeleton.get_skeletal_model_structure()
    root = np.zeros((6,), np.float32)
    root[4] = 1.0
    bone_len = rng.uniform(0.8, 1.2, size=(49,)).astype(np.float32)

    def to_xyz(hands_bdt):
        r6d = np.swapaxes(np.concatenate([x, hands_bdt], axis=1), 1, 2)  # (B, T, 288)
        aa = np.array(rotations.rot6d_to_aa(r6d))
        xyz = np.array(kinematics.aa_to_xyz(aa, root, bone_len, structure))
        return xyz.reshape(B, T, 50, 3)

    ref_xyz = to_xyz(ref_out)
    res = {}
    for name, out in outs.items():
        mpjpe = float(np.linalg.norm(to_xyz(out) - ref_xyz, axis=-1).mean())
        res[f"mpjpe_{name}_vs_torch"] = mpjpe
    res["budget"] = 1e-3
    for name in outs:
        res[f"{name}_within_budget"] = bool(res[f"mpjpe_{name}_vs_torch"] <= 1e-3)
    emit("bf16_e2e_mpjpe", res)

    # forward throughput at each precision (bench methodology: K chained
    # forwards in one program, scalar fetch to sync)
    import time as _time

    thr = {}
    Bb, K = 2048, 20
    xb = jnp.asarray(rng.randn(Bb, T, DIN).astype(np.float32))
    for name, precision, dtype in (
        ("f32_default", "bfloat16", jnp.float32),
        ("f32_highest", "float32", jnp.float32),
        ("bf16", "bfloat16", jnp.bfloat16),
    ):
        cast = lambda t: jax.tree.map(
            lambda a: jnp.asarray(a, dtype)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
            else jnp.asarray(a),
            t,
        )
        with jax.default_matmul_precision(precision):
            def many(v, x0):
                def body(i, carry):
                    y = module.apply(v, carry, None, False)
                    return carry + (1e-6 * y[:, :, :DIN]).astype(carry.dtype)
                return jax.lax.fori_loop(0, K, body, x0).astype(jnp.float32).mean()
            f = jax.jit(many)
        v = cast(variables)
        xc = xb.astype(dtype)
        float(f(v, xc))  # compile
        best = np.inf
        for _ in range(3):
            t0 = _time.perf_counter()
            float(f(v, xc))
            best = min(best, (_time.perf_counter() - t0) / K)
        thr[f"frames_per_s_{name}"] = round(Bb * T / best)
    emit("forward_throughput_by_precision", thr)


def phase_article_scale(epochs=200):
    """MEASURED 200-epoch run at article scale, resident in HBM."""
    import jax
    import jax.numpy as jnp

    from multimodal_hand_pose_enhancement_for_sign_language_tpu.train.gan import (
        GanConfig,
        GanTrainer,
    )

    N_TRAIN, N_VAL, T, DIN, DOUT = 31128, 1741, 192, 36, 252
    B = 256
    cfg = GanConfig(batch_size=B, learning_rate=1e-4, loss="L1")
    tr = GanTrainer(cfg)
    state = tr.init_state()

    # generate the dataset ON DEVICE (no 7 GB tunnel upload)
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    X = jax.random.normal(k1, (N_TRAIN, T, DIN), jnp.float32)
    Y = jax.random.normal(k2, (N_TRAIN, T, DOUT), jnp.float32)
    vX = jax.random.normal(k3, (N_VAL, T, DIN), jnp.float32)
    vY = jax.random.normal(k4, (N_VAL, T, DOUT), jnp.float32)
    X.block_until_ready()

    host_rng = np.random.RandomState(23456)
    no_shuffle_val = np.arange(N_VAL)

    # warm the three programs (compiles excluded from the measurement)
    t_compile = time.perf_counter()
    s2, _ = tr.run_epoch_resident(state, X, Y, None, np.arange(N_TRAIN), "g", B)
    s2, _ = tr.run_epoch_resident(s2, X, Y, None, np.arange(N_TRAIN), "d", B)
    tr.run_epoch_resident(s2, vX, vY, None, no_shuffle_val, "val", B // 2)
    compile_s = time.perf_counter() - t_compile
    del s2
    state = tr.init_state()

    t0 = time.perf_counter()
    g_losses, val_losses, d_losses = [], [], []
    for epoch in range(epochs):
        perm = host_rng.permutation(N_TRAIN)
        if epoch > 0 and epoch % cfg.epochs_train_disc == 0:
            state, d = tr.run_epoch_resident(state, X, Y, None, perm, "d", B)
            d_losses.append(d)
        else:
            state, g = tr.run_epoch_resident(state, X, Y, None, perm, "g", B)
            g_losses.append(g)
            _, v = tr.run_epoch_resident(
                state, vX, vY, None, no_shuffle_val, "val", B // 2
            )
            val_losses.append(v)
    wall = time.perf_counter() - t0
    emit(
        "article_scale_200ep",
        {
            "n_train": N_TRAIN,
            "n_val": N_VAL,
            "epochs": epochs,
            "batch_size": B,
            "wall_clock_s": round(wall, 1),
            "wall_clock_min": round(wall / 60, 2),
            "compile_s": round(compile_s, 1),
            "s_per_epoch": round(wall / epochs, 3),
            "reference_wall_clock_s": 7200,
            "speedup_vs_reference": round(7200 / wall, 1),
            "final_train_loss": g_losses[-1],
            "final_val_loss": val_losses[-1],
            "finite": bool(
                np.isfinite(g_losses).all()
                and np.isfinite(val_losses).all()
                and np.isfinite(d_losses).all()
            ),
        },
    )


def phase_filter_chunk_sweep():
    """Pallas filter chunk (clips per kernel instance) sweep — the
    occupancy lever identified in the STATUS roofline note.  VMEM per
    grid step is chunk * J_PAD * t_pad * 4 B * 10 buffers (~4.6 MB at
    chunk=16, T<=128), so up to chunk=128 fits easily."""
    import jax.numpy as jnp

    from multimodal_hand_pose_enhancement_for_sign_language_tpu.ops import (
        pallas_kernels,
    )

    B, T, n_cycles = 256, 128, 900
    rng = np.random.RandomState(0)
    args = [
        jnp.asarray(rng.randn(B, T, 50).astype(np.float32)) for _ in range(5)
    ]  # x0, y0, z0, tarx, tary
    w = jnp.asarray(rng.uniform(0.3, 1.0, size=(B, T, 50)).astype(np.float32))
    mask = jnp.ones((B, T), jnp.float32)

    out = {}
    # chunk 64+ exceeds the 16 MB scoped-VMEM limit (10 buffers x
    # chunk*56 x 128 f32); sweep within budget
    for chunk in (8, 16, 32):
        import jax

        f = jax.jit(
            lambda *a: pallas_kernels.filter_sgd(
                *a, learning_rate=20.0, n_cycles=n_cycles, chunk=chunk
            )
        )
        x, y, z = f(*args, w, mask)
        float(jnp.sum(x))  # compile + sync
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            x, y, z = f(*args, w, mask)
        s = float(jnp.sum(x) + jnp.sum(y) + jnp.sum(z))
        assert np.isfinite(s)
        dt = (time.perf_counter() - t0) / reps
        out[f"chunk{chunk}_ms"] = round(dt * 1e3, 2)
        out[f"chunk{chunk}_frames_per_s"] = round(B * T / dt)
    best = max((v, k) for k, v in out.items() if k.endswith("frames_per_s"))
    out["best"] = best[1]
    emit("filter_chunk_sweep", out)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip-article", action="store_true")
    p.add_argument("--epochs", type=int, default=200)
    args = p.parse_args()
    phase_steps()
    phase_bf16_mpjpe()
    phase_filter_chunk_sweep()
    if not args.skip_article:
        phase_article_scale(args.epochs)


if __name__ == "__main__":
    main()
