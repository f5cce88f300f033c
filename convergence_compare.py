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


def make_windows(n=128, T=32, din=12, dout=24, seed=7, with_feats=False):
    """Smooth random curves, standardized with the framework's
    calc_standard (tested equal to the reference's) — both sides consume
    the exact same float32 arrays.  With `with_feats`, also returns
    512-d pseudo text embeddings correlated with the targets (text feats
    pass through UN-standardized, matching the reference's load path)."""
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
    out = [
        (train_X - mx) / sx, (train_Y - my) / sy,
        (val_X - mx) / sx, (val_Y - my) / sy,
    ]
    if with_feats:
        emb = rng.randn(n, 512).astype(np.float32)
        emb[:, :din] += phase[:, 0, :]  # weakly informative, like real text
        out += [emb[:-n_val], emb[-n_val:]]
    else:
        out += [None, None]
    return tuple(out)


TORCH_GENS = {"v1": "regressor_fcn_bn_32", "v2": "regressor_fcn_bn_32_v2"}


def torch_models(din, dout, default_size, seed=23456, model="v1",
                 require_text=None):
    import torch

    sys.path.append(REF)
    import modelZoo as ref_zoo

    torch.manual_seed(seed)  # train_gan.py:48
    gen = getattr(ref_zoo, TORCH_GENS[model])()
    gen.build_net(din, dout, require_text=require_text, default_size=default_size)
    disc = ref_zoo.regressor_fcn_bn_discriminator()
    disc.build_net(dout)
    return gen, disc


def torch_robust_criterion(dout, T):
    """The reference's RobustLoss construction (train_gan.py:74-78) on
    CPU, incl. its quirk: the adaptive latents are NOT in the optimizer
    (only generator.parameters() are, :69), so alpha/scale stay at their
    init."""
    import torch

    sys.path.append(os.path.join(REF, "utils"))
    # distribution.py uses the long-removed pkg_resources API; shim just
    # resource_stream so it can load its spline resource
    if "pkg_resources" not in sys.modules:
        import importlib
        import types

        def _resource_stream(package, resource):
            mod = importlib.import_module(package)
            return open(
                os.path.join(os.path.dirname(mod.__file__), resource), "rb"
            )

        shim = types.ModuleType("pkg_resources")
        shim.resource_stream = _resource_stream
        sys.modules["pkg_resources"] = shim
    from robust_loss import adaptive as ref_adaptive

    return ref_adaptive.AdaptiveLossFunction(
        num_dims=dout * T, float_dtype=torch.float32, device="cpu"
    )


def run_torch(train_X, train_Y, val_X, val_Y, epochs, batch_size, lr,
              default_size, epochs_train_disc=3, seed=23456, loss="L1",
              model="v1", train_F=None, val_F=None, dropout_rate=None):
    """The reference loop, faithfully: train_gan.py:102-121 schedule,
    :215-254 D step, :258-297 G step (incl. the RobustLoss branch
    :286-292), :312-340 val at batch//2."""
    import torch
    from torch import nn

    din, dout = train_X.shape[-1], train_Y.shape[-1]
    require_text = True if train_F is not None else None
    gen, disc = torch_models(din, dout, default_size, seed, model=model,
                             require_text=require_text)
    if dropout_rate is not None:
        # A/B knob: the reference hard-codes Dropout(0.5); overriding p
        # on both sides isolates the dropout-stream divergence from any
        # real numeric drift (VERDICT r3 weak #4)
        for mod in list(gen.modules()) + list(disc.modules()):
            if isinstance(mod, nn.Dropout):
                mod.p = dropout_rate
    init_sd = {k: v.clone() for k, v in gen.state_dict().items()}
    init_d_sd = {k: v.clone() for k, v in disc.state_dict().items()}
    # only generator.parameters() enter Adam (train_gan.py:69): the
    # RobustLoss latents are created but never optimized (the quirk)
    g_opt = torch.optim.Adam(gen.parameters(), lr=lr, weight_decay=0)
    d_opt = torch.optim.Adam(disc.parameters(), lr=lr, weight_decay=0)
    gan_criterion = nn.MSELoss()
    if loss == "RobustLoss":
        robust = torch_robust_criterion(dout, train_X.shape[1])

        def reg(out, yb):
            o2 = torch.reshape(out, (out.shape[0], -1))
            y2 = torch.reshape(yb, (out.shape[0], -1))
            return torch.mean(robust.lossfun(o2 - y2))
    else:
        reg = nn.L1Loss()
    rng = np.random.RandomState(seed)  # train_gan.py:47 (shuffle stream)

    def calc_motion(t):
        return t[:, :, :1] - t[:, :, :-1]

    def fwd(xb, fb):
        if fb is None:
            return gen(xb)
        return gen(xb, feats_=fb)

    # reference data layout is (N, D, T)
    trX = np.swapaxes(train_X, 1, 2).copy()
    trY = np.swapaxes(train_Y, 1, 2).copy()
    vaX = np.swapaxes(val_X, 1, 2).copy()
    vaY = np.swapaxes(val_Y, 1, 2).copy()
    trF = None if train_F is None else train_F.copy()

    hist = {"train": [], "val": [], "disc": []}
    for epoch in range(epochs):
        if epoch > 0 and epoch % epochs_train_disc == 0:
            gen.eval(); disc.train()
            total = 0.0
            nb = trX.shape[0] // batch_size
            for bi in range(nb):
                sl = slice(bi * batch_size, (bi + 1) * batch_size)
                xb = torch.from_numpy(trX[sl]); yb = torch.from_numpy(trY[sl])
                fb = None if trF is None else torch.from_numpy(trF[sl])
                with torch.no_grad():
                    fake = fwd(xb, fb).detach()
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
                fb = None if trF is None else torch.from_numpy(trF[sl])
                out = fwd(xb, fb)
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
                    fb = None if val_F is None else torch.from_numpy(val_F[sl])
                    out = fwd(torch.from_numpy(vaX[sl]), fb)
                    vtotal += reg(out, torch.from_numpy(vaY[sl])).item() * vb
            hist["val"].append(vtotal / max(nvb * vb, 1))
        # per-epoch train reshuffle (train_gan.py:113-119)
        I = np.arange(trX.shape[0]); rng.shuffle(I)
        trX, trY = trX[I], trY[I]
        if trF is not None:
            trF = trF[I]
    return hist, init_sd, init_d_sd


def run_jax(train_X, train_Y, val_X, val_Y, epochs, batch_size, lr,
            default_size, init_sd, init_d_sd, epochs_train_disc=3,
            seed=23456, loss="L1", model="v1", train_F=None, val_F=None,
            dropout_rate=None):
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
        model=model, feature_in_dim=din, feature_out_dim=dout,
        default_size=default_size, window_t=train_X.shape[1],
        batch_size=batch_size, learning_rate=lr, loss=loss,
        epochs_train_disc=epochs_train_disc,
        require_text=train_F is not None,
        **({} if dropout_rate is None else {"dropout_rate": dropout_rate}),
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
    trF = None if train_F is None else train_F.copy()
    hist = {"train": [], "val": [], "disc": []}
    for epoch in range(epochs):
        if epoch > 0 and epoch % epochs_train_disc == 0:
            state, d = tr.run_epoch(state, trX, trY, trF, "d", batch_size)
            hist["disc"].append(d)
        else:
            state, g = tr.run_epoch(state, trX, trY, trF, "g", batch_size)
            hist["train"].append(g)
            _, v = tr.run_epoch(
                state, val_X, val_Y, val_F, "val", batch_size // 2
            )
            hist["val"].append(v)
        I = np.arange(trX.shape[0]); rng.shuffle(I)
        trX, trY = trX[I], trY[I]
        if trF is not None:
            trF = trF[I]
    return hist


# The three convergence corners (VERDICT r2): the plain path, the
# adaptive-NLL path (RobustLoss quirk: latents never optimized), and
# the text-conditioned v2 path (time-concat bottleneck).
CONFIGS = {
    "v1_l1": dict(model="v1", loss="L1", with_feats=False),
    "v1_robust": dict(model="v1", loss="RobustLoss", with_feats=False),
    "v2_text": dict(model="v2", loss="L1", with_feats=True),
}


def compare(epochs=50, n=128, T=32, din=12, dout=24, batch_size=16,
            lr=1e-4, default_size=32, config="v1_l1", dropout_rate=None):
    spec = CONFIGS[config]
    train_X, train_Y, val_X, val_Y, train_F, val_F = make_windows(
        n, T, din, dout, with_feats=spec["with_feats"]
    )
    t_hist, init_sd, init_d_sd = run_torch(
        train_X, train_Y, val_X, val_Y, epochs, batch_size, lr, default_size,
        loss=spec["loss"], model=spec["model"], train_F=train_F, val_F=val_F,
        dropout_rate=dropout_rate,
    )
    j_hist = run_jax(
        train_X, train_Y, val_X, val_Y, epochs, batch_size, lr, default_size,
        init_sd, init_d_sd, loss=spec["loss"], model=spec["model"],
        train_F=train_F, val_F=val_F, dropout_rate=dropout_rate,
    )
    k = max(1, min(5, len(t_hist["val"])))
    t_final = float(np.mean(t_hist["val"][-k:]))
    j_final = float(np.mean(j_hist["val"][-k:]))
    tr_t = np.asarray(t_hist["train"]); tr_j = np.asarray(j_hist["train"])
    res = {
        "config": config,
        "model": spec["model"],
        "loss": spec["loss"],
        "epochs": epochs,
        "dropout_rate": dropout_rate,
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
    p.add_argument(
        "--configs", nargs="+", default=["v1_l1"],
        choices=sorted(CONFIGS), help="which corners to run ('all' via "
        "listing them); results are keyed by config in --out",
    )
    p.add_argument(
        "--dropout_rate", type=float, default=None,
        help="override BOTH sides' dropout p (the reference hard-codes "
        "0.5).  0.0 is the A/B that isolates dropout-stream divergence "
        "from real numeric drift; results are keyed "
        "'{config}_dropout{p}' so the default record is kept",
    )
    args = p.parse_args()
    # merge into an existing record so corners can be (re)run separately
    all_res = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            prev = json.load(f)
        # legacy flat schema (r2: a single v1_l1 record) migrates in
        all_res = prev if "config" not in prev and any(
            k in CONFIGS for k in prev
        ) else {"v1_l1": prev}
    for config in args.configs:
        res = compare(epochs=args.epochs, n=args.n,
                      batch_size=args.batch_size, config=config,
                      dropout_rate=args.dropout_rate)
        key = config if args.dropout_rate is None else (
            f"{config}_dropout{args.dropout_rate:g}"
        )
        all_res[key] = res
        print(json.dumps({k: v for k, v in res.items()
                          if not isinstance(v, list)}, indent=1))
    with open(args.out, "w") as f:
        json.dump(all_res, f, indent=1)


if __name__ == "__main__":
    main()
