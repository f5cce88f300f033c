#!/usr/bin/env python
"""Article-scale 200-epoch training re-measurement after the round-2.5
trainer changes (rbg dropout PRNG + even/odd transpose-conv
decomposition).  Same protocol as the r2 run (TPU_MEASURE_r2.json
"article_scale_200ep"): 31,128 train / 1,741 val windows resident in
HBM, batch 256, D every 3rd epoch, val at half batch — the reference's
2 h / 200 epochs workload (article §4.1.3).  Appends to TPU_PROBE.json.

Run on the chip:  python tpu_article_rbg.py [epochs]
"""

import json
import sys
import time

import numpy as np

from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils.platform import (
    ensure_platform_from_env,
)

ensure_platform_from_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodal_hand_pose_enhancement_for_sign_language_tpu.train.gan import (  # noqa: E402
    GanConfig,
    GanTrainer,
)

OUT = "TPU_PROBE.json"


def main(epochs=200):
    N_TRAIN, N_VAL, T, DIN, DOUT = 31128, 1741, 192, 36, 252
    B = 256
    results = {}
    for impl in ("rbg", "threefry2x32"):
        cfg = GanConfig(
            batch_size=B, learning_rate=1e-4, loss="L1", prng_impl=impl
        )
        tr = GanTrainer(cfg)
        state = tr.init_state()

        key = jax.random.PRNGKey(0)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        X = jax.random.normal(k1, (N_TRAIN, T, DIN), jnp.float32)
        Y = jax.random.normal(k2, (N_TRAIN, T, DOUT), jnp.float32)
        vX = jax.random.normal(k3, (N_VAL, T, DIN), jnp.float32)
        vY = jax.random.normal(k4, (N_VAL, T, DOUT), jnp.float32)
        float(jnp.sum(X))

        host_rng = np.random.RandomState(23456)
        no_shuffle_val = np.arange(N_VAL)

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
        results[impl] = {
            "epochs": epochs,
            "wall_clock_s": round(wall, 1),
            "wall_clock_min": round(wall / 60, 2),
            "compile_s": round(compile_s, 1),
            "s_per_epoch": round(wall / epochs, 3),
            "speedup_vs_reference_2h": round(7200 / wall, 1),
            "final_train_loss": g_losses[-1],
            "final_val_loss": val_losses[-1],
            "finite": bool(
                np.isfinite(g_losses).all()
                and np.isfinite(val_losses).all()
                and np.isfinite(d_losses).all()
            ),
        }
        print(json.dumps({impl: results[impl]}), flush=True)
        del X, Y, vX, vY, state

    all_r = json.load(open(OUT))
    all_r["article_scale_200ep_r2_5"] = results
    with open(OUT, "w") as f:
        json.dump(all_r, f, indent=1)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200)
