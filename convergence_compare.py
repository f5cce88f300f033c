#!/usr/bin/env python
"""Statistical training-convergence comparison: torch reference vs JAX.

Trains the reference torch train_gan.py loop (reconstructed faithfully
from /root/reference/train_gan.py:27-121,215-370) and this framework's
GanTrainer on the IDENTICAL synthetic window set — identical initial
weights (ported torch->flax), identical standardization, identical
host-side shuffles (one shared RandomState(23456) stream per side,
train_gan.py:47,113-119), identical epoch schedule (epoch 0 G; epoch>0
and epoch%3==0 D; else G + val at half batch, :102-112,317).  The only
remaining stochastic difference is each framework's dropout stream, so
the comparison is statistical: loss trajectories must track within a
band rather than bit-match (the bit-level single-step check lives in
parity_harness.train_step_parity).

Usage: python convergence_compare.py [--epochs 50] [--out CONVERGENCE.json]
"""

import argparse
import json
import os
import sys

import numpy as np

from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils.platform import (
    ensure_platform_from_env,
)

ensure_platform_from_env()

REF = "/root/reference"


def make_windows(n=128, T=32, din=12, dout=24, seed=7):
    """Smooth random curves, standardized with the framework's
    calc_standard (tested equal to the reference's) — both sides consume
    the exact same float32 arrays."""
    from multimodal_hand_pose_enhancement_for_sign_language_tpu.data import (
        standardize,
    )

    rng = np.random.RandomState(seed)
    t = np.linspace(0, 4 * np.pi, T)[None, :, None]
    phase = rng.uniform(0, 2 * np.pi, size=(n, 1, din))
    X = np.sin(t + phase) + 0.1 * rng.randn(n, T, din)
    mix = rng.randn(din, dout) / np.sqrt(din)
    Y = np.tanh(X @ mix) + 0.05 * rng.randn(n, T, dout)
    X = X.astype(np.float32)
    Y = Y.astype(np.float32)
    n_val = max(8, n // 8)
    train_X, val_X = X[:-n_val], X[-n_val:]
    train_Y, val_Y = Y[:-n_val], Y[-n_val:]
    mx, sx, my, sy = standardize.calc_standard(train_X, train_Y, "arm2wh")
    return (
        (train_X - mx) / sx, (train_Y - my) / sy,
        (val_X - mx) / sx, (val_Y - my) / sy,
    )


def torch_models(din, dout, default_size, seed=23456):
    import torch

    sys.path.append(REF)
    import modelZoo as ref_zoo

    torch.manual_seed(seed)  # train_gan.py:48
    gen = ref_zoo.regressor_fcn_bn_32()
    gen.build_net(din, dout, require_text=None, default_size=default_size)
    disc = ref_zoo.regressor_fcn_bn_discriminator()
    disc.build_net(dout)
    return gen, disc


def run_torch(train_X, train_Y, val_X, val_Y, epochs, batch_size, lr,
              default_size, epochs_train_disc=3, seed=23456):
    """The reference loop, faithfully: train_gan.py:102-121 schedule,
    :215-254 D step, :258-297 G step, :312-340 val at batch//2."""
    import torch
    from torch import nn

    din, dout = train_X.shape[-1], train_Y.shape[-1]
    gen, disc = torch_models(din, dout, default_size, seed)
    init_sd = {k: v.clone() for k, v in gen.state_dict().items()}
    init_d_sd = {k: v.clone() for k, v in disc.state_dict().items()}
    g_opt = torch.optim.Adam(gen.parameters(), lr=lr, weight_decay=0)
    d_opt = torch.optim.Adam(disc.parameters(), lr=lr, weight_decay=0)
    gan_criterion = nn.MSELoss()
    reg = nn.L1Loss()
    rng = np.random.RandomState(seed)  # train_gan.py:47 (shuffle stream)

    def calc_motion(t):
        return t[:, :, :1] - t[:, :, :-1]

    # reference data layout is (N, D, T)
    trX = np.swapaxes(train_X, 1, 2).copy()
    trY = np.swapaxes(train_Y, 1, 2).copy()
    vaX = np.swapaxes(val_X, 1, 2).copy()
    vaY = np.swapaxes(val_Y, 1, 2).copy()

    hist = {"train": [], "val": [], "disc": []}
    for epoch in range(epochs):
        if epoch > 0 and epoch % epochs_train_disc == 0:
            gen.eval(); disc.train()
            total = 0.0
            nb = trX.shape[0] // batch_size
            for bi in range(nb):
                sl = slice(bi * batch_size, (bi + 1) * batch_size)
                xb = torch.from_numpy(trX[sl]); yb = torch.from_numpy(trY[sl])
                with torch.no_grad():
                    fake = gen(xb).detach()
                fs = disc(calc_motion(fake)); rs = disc(calc_motion(yb))
                d_loss = gan_criterion(fs, torch.zeros_like(fs)) + gan_criterion(
                    rs, torch.ones_like(rs))
                d_opt.zero_grad(); d_loss.backward(); d_opt.step()
                total += d_loss.item() * batch_size
            hist["disc"].append(total / max(nb * batch_size, 1))
        else:
            disc.eval(); gen.train()
            total = 0.0
            nb = trX.shape[0] // batch_size
            for bi in range(nb):
                sl = slice(bi * batch_size, (bi + 1) * batch_size)
                xb = torch.from_numpy(trX[sl]); yb = torch.from_numpy(trY[sl])
                out = gen(xb)
                with torch.no_grad():
                    fs = disc(calc_motion(out))
                fs = fs.detach()
                g_loss = reg(out, yb) + gan_criterion(fs, torch.ones_like(fs))
                g_opt.zero_grad(); g_loss.backward(); g_opt.step()
                total += g_loss.item() * batch_size
            hist["train"].append(total / max(nb * batch_size, 1))
            # validation (train_gan.py:312-340): eval mode, batch//2
            gen.eval(); disc.eval()
            vb = batch_size // 2
            nvb = vaX.shape[0] // vb
            vtotal = 0.0
            with torch.no_grad():
                for bi in range(nvb):
                    sl = slice(bi * vb, (bi + 1) * vb)
                    out = gen(torch.from_numpy(vaX[sl]))
                    vtotal += reg(out, torch.from_numpy(vaY[sl])).item() * vb
            hist["val"].append(vtotal / max(nvb * vb, 1))
        # per-epoch train reshuffle (train_gan.py:113-119)
        I = np.arange(trX.shape[0]); rng.shuffle(I)
        trX, trY = trX[I], trY[I]
    return hist, init_sd, init_d_sd


def run_jax(train_X, train_Y, val_X, val_Y, epochs, batch_size, lr,
            default_size, init_sd, init_d_sd, epochs_train_disc=3,
            seed=23456):
    """GanTrainer with the same ported initial weights and the same
    shared shuffle stream."""
    import jax
    import jax.numpy as jnp

    from multimodal_hand_pose_enhancement_for_sign_language_tpu.models import (
        torch_port,
    )
    from multimodal_hand_pose_enhancement_for_sign_language_tpu.train.gan import (
        GanConfig,
        GanTrainer,
    )

    din, dout = train_X.shape[-1], train_Y.shape[-1]
    cfg = GanConfig(
        model="v1", feature_in_dim=din, feature_out_dim=dout,
        default_size=default_size, window_t=train_X.shape[1],
        batch_size=batch_size, learning_rate=lr, loss="L1",
        epochs_train_disc=epochs_train_disc,
    )
    tr = GanTrainer(cfg)
    state = tr.init_state()
    g_vars = torch_port.generator_from_torch_state(init_sd)
    d_vars = torch_port.discriminator_from_torch_state(init_d_sd)
    state["g_params"] = jax.tree.map(jnp.asarray, g_vars["params"])
    state["g_stats"] = jax.tree.map(jnp.asarray, g_vars["batch_stats"])
    state["d_params"] = jax.tree.map(jnp.asarray, d_vars["params"])
    state["d_stats"] = jax.tree.map(jnp.asarray, d_vars["batch_stats"])
    state["g_opt"] = tr.g_tx.init(state["g_params"])
    state["d_opt"] = tr.d_tx.init(state["d_params"])

    rng = np.random.RandomState(seed)
    trX, trY = train_X.copy(), train_Y.copy()
    hist = {"train": [], "val": [], "disc": []}
    for epoch in range(epochs):
        if epoch > 0 and epoch % epochs_train_disc == 0:
            state, d = tr.run_epoch(state, trX, trY, None, "d", batch_size)
            hist["disc"].append(d)
        else:
            state, g = tr.run_epoch(state, trX, trY, None, "g", batch_size)
            hist["train"].append(g)
            _, v = tr.run_epoch(state, val_X, val_Y, None, "val", batch_size // 2)
            hist["val"].append(v)
        I = np.arange(trX.shape[0]); rng.shuffle(I)
        trX, trY = trX[I], trY[I]
    return hist


def compare(epochs=50, n=128, T=32, din=12, dout=24, batch_size=16,
            lr=1e-4, default_size=32):
    train_X, train_Y, val_X, val_Y = make_windows(n, T, din, dout)
    t_hist, init_sd, init_d_sd = run_torch(
        train_X, train_Y, val_X, val_Y, epochs, batch_size, lr, default_size
    )
    j_hist = run_jax(
        train_X, train_Y, val_X, val_Y, epochs, batch_size, lr, default_size,
        init_sd, init_d_sd,
    )
    k = max(1, min(5, len(t_hist["val"])))
    t_final = float(np.mean(t_hist["val"][-k:]))
    j_final = float(np.mean(j_hist["val"][-k:]))
    tr_t = np.asarray(t_hist["train"]); tr_j = np.asarray(j_hist["train"])
    res = {
        "epochs": epochs,
        "torch_train": t_hist["train"], "jax_train": j_hist["train"],
        "torch_val": t_hist["val"], "jax_val": j_hist["val"],
        "torch_disc": t_hist["disc"], "jax_disc": j_hist["disc"],
        "final_val_torch": t_final, "final_val_jax": j_final,
        "final_val_rel_diff": abs(t_final - j_final) / max(t_final, 1e-9),
        "train_traj_max_rel_diff": float(
            np.max(np.abs(tr_t - tr_j) / np.maximum(np.abs(tr_t), 1e-9))
        ),
        "train_traj_corr": float(np.corrcoef(tr_t, tr_j)[0, 1]),
    }
    return res


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--n", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--out", type=str, default="CONVERGENCE.json")
    args = p.parse_args()
    res = compare(epochs=args.epochs, n=args.n, batch_size=args.batch_size)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({k: v for k, v in res.items()
                      if not isinstance(v, list)}, indent=1))


if __name__ == "__main__":
    main()
