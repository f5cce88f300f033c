"""The GAN training engine: jit-compiled G/D/val steps + epoch driver.

Faithful re-design of train_gan.py (/root/reference/train_gan.py):

  * schedule — epoch 0 trains G; epoch > 0 with epoch % epochs_train_disc
    == 0 trains D; all other epochs train G then validate at half batch
    size (:102-112, :317),
  * early stop after `patience` non-improving epochs once epoch > 100
    (:105-107),
  * per-epoch shuffle with a persistent RandomState(23456) (:47, :113-119),
  * ``calc_motion`` exactly as written — first frame minus each of the
    first T-1 frames, NOT adjacent deltas (:209-211),
  * LSGAN MSE with optional 0.9/0.1 label smoothing (:242-247),
  * the generator's adversarial term uses a no_grad + detached D score
    (:282-284) so it contributes value but ZERO gradient — reproduced via
    stop_gradient; pass effective_gan=True for a real adversarial gradient
    (extension, off by default),
  * RobustLoss latents exist but are not in the optimizer (:69, :76-78),
  * Adam(lr, wd=0); ReduceLROnPlateau(patience=1e6) is effectively
    disabled but implemented (schedulers.py).

TPU-native differences: steps are single XLA programs in NLC layout;
batches are sharded along a 'data' mesh axis (NamedSharding) so the same
jitted step scales from 1 chip to a pod slice, XLA inserting the gradient
all-reduce over ICI.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimodal_hand_pose_enhancement_for_sign_language_tpu import losses as losses_lib
from multimodal_hand_pose_enhancement_for_sign_language_tpu.losses.robust import (
    AdaptiveLossFunction,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.models import registry
from multimodal_hand_pose_enhancement_for_sign_language_tpu.parallel import mesh as mesh_lib
from multimodal_hand_pose_enhancement_for_sign_language_tpu.train.staging import (
    Staged as _Staged,
    as_staged,
    flatten_rows,
)


def calc_motion(tensor_btd):
    """Temporal 'motion' exactly as the reference computes it
    (train_gan.py:209-211, translated to NLC): first frame minus each of
    the first T-1 frames."""
    return tensor_btd[:, :1, :] - tensor_btd[:, :-1, :]


def mse(a, b):
    return jnp.mean(jnp.square(a - b))


@dataclass
class GanConfig:
    model: str = "v1"
    pipeline: str = "arm2wh"
    feature_in_dim: int = 36
    feature_out_dim: int = 252
    batch_size: int = 128
    learning_rate: float = 1e-4
    num_epochs: int = 200
    patience: int = 100
    epochs_train_disc: int = 3
    disc_label_smooth: bool = False
    loss: str = "L1"
    require_text: bool = False
    require_image: bool = False
    default_size: int = 256
    seed: int = 23456
    effective_gan: bool = False  # extension: real adversarial gradient
    window_t: int = 192
    # reference hard-codes Dropout(0.5); 0.0 disables dropout everywhere
    # (train-step parity harness / ablations)
    dropout_rate: float = 0.5
    # batch the D step's fake+real passes into one vmapped forward
    # (torch-parity-exact, see _d_step_impl).  Measured on v5e at the
    # article config (B=256): fused 5.16 ms vs sequential 5.00 ms — the
    # D convs are too small for the extra batching to beat XLA's own
    # overlap of the two passes, so the literal reference form stays the
    # default (TPU_MEASURE_r2.json "steps_B256").
    fused_d: bool = False
    # "bfloat16" runs model compute in bf16 (params/optimizer stay f32,
    # losses reduce in f32) — the TPU MXU's native dtype; ~2x step speed.
    compute_dtype: str = "float32"
    # PRNG implementation for the dropout mask stream.  "rbg" lowers to
    # the TPU's hardware RNG; measured on v5e at B=256 the train-mode
    # forward drops 1.99 -> 1.05 ms because the ~10 threefry mask
    # generations are ~45% of it (TPU_PROBE.json "train_step_breakdown").
    # The reference's torch dropout stream differs from any JAX impl
    # anyway, so this changes no parity contract; "threefry2x32" restores
    # the backend-independent stream.
    prng_impl: str = "rbg"


class GanTrainer:
    """Builds models/optimizers and exposes jitted train/val steps."""

    def __init__(self, cfg: GanConfig, mesh=None, tp: bool = False):
        self.cfg = cfg
        self.mesh = mesh
        # tensor parallelism: with tp=True (and a mesh with a 'model'
        # axis), generator inputs/outputs get with_sharding_constraint
        # anchors so XLA keeps channel-sharded params sharded instead of
        # all-gathering them (see parallel/mesh.act_constraint).
        self.tp = tp and mesh is not None
        self.generator = registry.build_generator(
            cfg.model,
            cfg.feature_in_dim,
            cfg.feature_out_dim,
            require_text=cfg.require_text,
            require_image=cfg.require_image,
            default_size=cfg.default_size,
            dropout_rate=cfg.dropout_rate,
        )
        self.discriminator = registry.build_discriminator(
            cfg.feature_out_dim, dropout_rate=cfg.dropout_rate
        )
        self.g_tx = optax.inject_hyperparams(optax.adam)(
            learning_rate=cfg.learning_rate
        )
        self.d_tx = optax.inject_hyperparams(optax.adam)(
            learning_rate=cfg.learning_rate
        )
        if cfg.loss == "RobustLoss":
            self.adaptive = AdaptiveLossFunction(
                num_dims=cfg.feature_out_dim * cfg.window_t
            )
            self.reg_loss = None
        else:
            self.adaptive = None
            self.reg_loss = losses_lib.get_loss(cfg.loss)
        # fused Pallas Barron loss on real TPUs (identical math, one pass)
        try:
            self._fused_robust = (
                self.adaptive is not None and jax.devices()[0].platform == "tpu"
            )
        except Exception:
            self._fused_robust = False

        self._g_step = jax.jit(self._g_step_impl, donate_argnums=(0,))
        self._d_step = jax.jit(self._d_step_impl, donate_argnums=(0,))
        self._val_step = jax.jit(self._val_step_impl)
        self._epoch_scan = {
            kind: jax.jit(
                functools.partial(self._epoch_scan_impl, kind=kind),
                static_argnames=("has_feats",),
                # val must NOT donate: the caller keeps using the state
                donate_argnums=(0,) if kind != "val" else (),
            )
            for kind in ("g", "d", "val")
        }
        self._epoch_scan_resident = {
            kind: jax.jit(
                functools.partial(self._epoch_scan_resident_impl, kind=kind),
                static_argnames=("has_feats", "batch_size", "trails"),
                donate_argnums=(0,) if kind != "val" else (),
            )
            for kind in ("g", "d", "val")
        }

    # ------------------------------------------------------------------
    # state
    # ------------------------------------------------------------------
    def init_state(self, rng=None) -> dict:
        if rng is None:
            # typed key: carries its impl through splits, checkpoints
            # (train/checkpoint.py serializes key_data + rewraps) and jit
            rng = jax.random.key(self.cfg.seed, impl=self.cfg.prng_impl)
        rng, gk, dk = jax.random.split(rng, 3)
        feats_dim = None
        g_vars = registry.init_generator(
            self.generator, gk, batch=2, T=self.cfg.window_t, feats_dim=feats_dim
        )
        d_vars = registry.init_discriminator(
            self.discriminator, dk, batch=2, T=self.cfg.window_t - 1
        )
        state = {
            "g_params": g_vars["params"],
            "g_stats": g_vars["batch_stats"],
            "d_params": d_vars["params"],
            "d_stats": d_vars["batch_stats"],
            "rng": rng,
        }
        state["g_opt"] = self.g_tx.init(state["g_params"])
        state["d_opt"] = self.d_tx.init(state["d_params"])
        state["robust"] = self.adaptive.init() if self.adaptive else {}
        if self.mesh is not None:
            state = mesh_lib.replicate(state, self.mesh)
        return state

    # ------------------------------------------------------------------
    # mixed precision
    # ------------------------------------------------------------------
    def _cast_in(self, tree):
        """Cast params/activations for compute; master copies stay f32."""
        if self.cfg.compute_dtype == "bfloat16":
            return jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if jnp.issubdtype(a.dtype, jnp.floating)
                else a,
                tree,
            )
        return tree

    def _cast_out(self, tree):
        if self.cfg.compute_dtype == "bfloat16":
            return jax.tree.map(
                lambda a: a.astype(jnp.float32)
                if a.dtype == jnp.bfloat16
                else a,
                tree,
            )
        return tree

    # ------------------------------------------------------------------
    # losses
    # ------------------------------------------------------------------
    def _reg(self, y_hat, y, robust_params):
        if self.adaptive is not None:
            resid = (y_hat - y).reshape(y_hat.shape[0], -1)
            if self._fused_robust:
                from multimodal_hand_pose_enhancement_for_sign_language_tpu.ops import (
                    pallas_kernels,
                )

                alpha = self.adaptive.alpha(robust_params)
                scale = self.adaptive.scale(robust_params)
                nll = (
                    pallas_kernels.lossfun_pallas(resid, alpha, scale, False)
                    + jnp.log(scale)
                    + self.adaptive.distribution.log_base_partition_function(alpha)
                )
                return jnp.mean(nll)
            return jnp.mean(self.adaptive.lossfun(resid, robust_params))
        return self.reg_loss(y_hat, y)

    # ------------------------------------------------------------------
    # steps (all NLC: x (B, T, Din), y (B, T, Dout))
    # ------------------------------------------------------------------
    def _g_loss(self, g_params, state, x, y, feats, dropout_rng):
        """The generator training loss — shared by the train step and the
        grad-flow diagnostic so logged gradients are the training
        gradients (incl. the adversarial term and train-mode BN/dropout).
        Returns (loss, new_g_batch_stats)."""
        xc = self._cast_in(x)
        if self.tp:
            xc = mesh_lib.act_constraint(xc, self.mesh)
        fc = self._cast_in(feats) if feats is not None else None
        y_hat, mut = self.generator.apply(
            {
                "params": self._cast_in(g_params),
                "batch_stats": self._cast_in(state["g_stats"]),
            },
            xc,
            fc,
            True,
            mutable=["batch_stats"],
            rngs={"dropout": dropout_rng},
        )
        y_hat = y_hat.astype(jnp.float32)
        if self.tp:
            y_hat = mesh_lib.act_constraint(y_hat, self.mesh)
        new_stats = self._cast_out(mut["batch_stats"])
        fake_motion = self._cast_in(calc_motion(y_hat))
        fake_score = self.discriminator.apply(
            {
                "params": self._cast_in(state["d_params"]),
                "batch_stats": self._cast_in(state["d_stats"]),
            },
            fake_motion,
            False,
        ).astype(jnp.float32)
        if not self.cfg.effective_gan:
            # reference quirk: score computed under no_grad + detached
            fake_score = jax.lax.stop_gradient(fake_score)
        g_loss = self._reg(y_hat, y, state["robust"]) + mse(
            fake_score, jnp.ones_like(fake_score)
        )
        return g_loss, new_stats

    def _g_step_impl(self, state, x, y, feats):
        rng, dropout_rng = jax.random.split(state["rng"])

        (loss, new_stats), grads = jax.value_and_grad(self._g_loss, has_aux=True)(
            state["g_params"], state, x, y, feats, dropout_rng
        )
        updates, g_opt = self.g_tx.update(grads, state["g_opt"], state["g_params"])
        state["g_params"] = optax.apply_updates(state["g_params"], updates)
        state["g_stats"] = new_stats
        state["g_opt"] = g_opt
        state["rng"] = rng
        return state, loss

    def _d_step_impl(self, state, x, y, feats):
        rng, dropout_rng = jax.random.split(state["rng"])
        dk1, dk2 = jax.random.split(dropout_rng)

        # G in eval mode (reference train_discriminator: generator.eval())
        fake = self.generator.apply(
            {
                "params": self._cast_in(state["g_params"]),
                "batch_stats": self._cast_in(state["g_stats"]),
            },
            self._cast_in(x),
            self._cast_in(feats) if feats is not None else None,
            False,
        )
        fake = jax.lax.stop_gradient(fake)
        fake_motion = calc_motion(fake)
        real_motion = self._cast_in(calc_motion(y))
        t_fake, t_real = (0.1, 0.9) if self.cfg.disc_label_smooth else (0.0, 1.0)

        def loss_fn(d_params):
            # The reference runs two sequential train-mode D forwards
            # (fake then real).  In train mode each forward normalizes by
            # ITS OWN batch statistics, so the passes are independent
            # except for the running-stat update order.  We therefore
            # batch both passes into ONE vmapped forward (bigger, better
            # MXU-utilizing convs, half the kernel launches) and recover
            # the exact sequential running stats algebraically:
            #   s1 = (1-m)*s0 + m*fake_stat        (fake pass)
            #   s2 = (1-m)*s1 + m*real_stat        (real pass)
            # with upd_f = (1-m)*s0 + m*fake_stat and
            #      upd_r = (1-m)*s0 + m*real_stat both computed from s0:
            #   s2 = (1-m)*upd_f + upd_r - (1-m)*s0.
            # Verified against torch by the train-step parity harness.
            dp = self._cast_in(d_params)
            s0 = self._cast_in(state["d_stats"])
            if not self.cfg.fused_d:  # literal sequential form (A/B)
                fake_score, mut1 = self.discriminator.apply(
                    {"params": dp, "batch_stats": s0}, fake_motion, True,
                    mutable=["batch_stats"], rngs={"dropout": dk1},
                )
                real_score, mut2 = self.discriminator.apply(
                    {"params": dp, "batch_stats": mut1["batch_stats"]},
                    real_motion, True,
                    mutable=["batch_stats"], rngs={"dropout": dk2},
                )
                d_loss = mse(
                    fake_score.astype(jnp.float32),
                    jnp.full_like(fake_score, t_fake, jnp.float32),
                ) + mse(
                    real_score.astype(jnp.float32),
                    jnp.full_like(real_score, t_real, jnp.float32),
                )
                return d_loss, self._cast_out(mut2["batch_stats"])
            motions = jnp.stack([fake_motion, real_motion])  # (2, B, T', C)
            keys = jnp.stack([dk1, dk2])

            def one(m, key):
                return self.discriminator.apply(
                    {"params": dp, "batch_stats": s0},
                    m,
                    True,
                    mutable=["batch_stats"],
                    rngs={"dropout": key},
                )

            scores, muts = jax.vmap(one)(motions, keys)
            fake_score = scores[0].astype(jnp.float32)
            real_score = scores[1].astype(jnp.float32)
            torch_m = 0.1  # every D BatchNorm uses torch momentum 0.1
            new_stats = jax.tree.map(
                lambda upd, s: (1 - torch_m) * upd[0] + upd[1] - (1 - torch_m) * s,
                muts["batch_stats"],
                s0,
            )
            d_loss = mse(fake_score, jnp.full_like(fake_score, t_fake)) + mse(
                real_score, jnp.full_like(real_score, t_real)
            )
            return d_loss, self._cast_out(new_stats)

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["d_params"]
        )
        updates, d_opt = self.d_tx.update(grads, state["d_opt"], state["d_params"])
        state["d_params"] = optax.apply_updates(state["d_params"], updates)
        state["d_stats"] = new_stats
        state["d_opt"] = d_opt
        state["rng"] = rng
        return state, loss

    def _val_step_impl(self, state, x, y, feats):
        y_hat = self.generator.apply(
            {
                "params": self._cast_in(state["g_params"]),
                "batch_stats": self._cast_in(state["g_stats"]),
            },
            self._cast_in(x),
            self._cast_in(feats) if feats is not None else None,
            False,
        ).astype(jnp.float32)
        return self._reg(y_hat, y, state["robust"])

    def _epoch_scan_impl(self, state, Xb, Yb, Fb, has_feats: bool, kind: str):
        """A whole epoch as ONE XLA program: lax.scan of the step over
        pre-batched (n_batches, B, T, D) arrays resident in HBM.  This is
        the TPU-native fast path — no per-batch dispatch or host->device
        transfer; use when the (possibly bf16) dataset fits device memory.
        """

        step = {"g": self._g_step_impl, "d": self._d_step_impl}.get(kind)

        def body(st, batch):
            x, y, f = batch
            f = f if has_feats else None
            if kind == "val":
                return st, self._val_step_impl(st, x, y, f)
            return step(st, x, y, f)

        feats_scan = Fb if has_feats else jnp.zeros((Xb.shape[0], 1))
        state, losses = jax.lax.scan(body, state, (Xb, Yb, feats_scan))
        return state, jnp.mean(losses)

    def _epoch_scan_resident_impl(
        self, state, X, Y, F, perm, has_feats: bool, batch_size: int,
        trails, kind: str
    ):
        """Device-resident epoch scan: the dataset lives in HBM across
        epochs; only the shuffle permutation (N int32s) crosses the host
        boundary each epoch.  The shuffle gather happens PER BATCH inside
        the scan body (B*T*D per step), so peak HBM is dataset + one
        batch — not dataset + a full shuffled copy; at article scale
        (31K x 192 x 288 f32 ~ 6.9 GB) that halves residency and fits a
        single v5e chip with headroom.

        X/Y/F arrive FLATTENED to (N, prod(trail)) — see stage() — and
        each gathered batch is reshaped back to (B,) + trail in the body.
        Rationale (round-4 OOM post-mortem): a resident (31128, 192, 264)
        f32 operand tiles its 264-wide lane axis up to 384 on TPU (1.5x,
        8.55 GB vs 5.88 GB) AND forces an in-program relayout copy next
        to the 6.6 GB argument buffers — 16.4 GB > 15.75 GB HBM.  The
        flat (N, 192*264) form has a lane width that is an exact multiple
        of 128 (192 is 64*3, so T*D is lane-exact for any even D): zero
        tile padding, no relayout, and only the (B,)-sized batch pays the
        per-step reshape."""
        x_trail, y_trail, f_trail = trails
        nb = X.shape[0] // batch_size
        perm_b = perm[: nb * batch_size].reshape(nb, batch_size)

        step = {"g": self._g_step_impl, "d": self._d_step_impl}.get(kind)

        def body(st, idx):
            x = jnp.take(X, idx, axis=0).reshape((batch_size,) + x_trail)
            y = jnp.take(Y, idx, axis=0).reshape((batch_size,) + y_trail)
            f = (
                jnp.take(F, idx, axis=0).reshape((batch_size,) + f_trail)
                if has_feats
                else None
            )
            if kind == "val":
                return st, self._val_step_impl(st, x, y, f)
            return step(st, x, y, f)

        state, losses = jax.lax.scan(body, state, perm_b)
        return state, jnp.mean(losses)

    def stage(self, X, Y, feats=None):
        """Move the full (N, T, D) dataset to device memory once (sharded
        over the mesh 'data' axis when available) for resident epoch
        scans.  Arrays are staged FLATTENED to (N, T*D): on TPU the flat
        lane axis tiles exactly (192*D is a multiple of 128 for even D)
        where the 3-D form pads D up to the next 128 multiple — at
        article scale that is the difference between 5.9 GB and 8.6 GB
        of HBM residency plus a full relayout copy (the round-4 config-2
        OOM).  Returns _Staged(dev, trail) records; run_epoch_resident
        reshapes each gathered batch back to (B,) + trail on device."""
        def put(a):
            if a is None:
                return None
            a, trail = flatten_rows(a)
            if self.mesh is not None and self.mesh.devices.size > 1:
                n_data = self.mesh.shape["data"]
                if a.shape[0] % n_data == 0:
                    return _Staged(mesh_lib.shard_batch(a, self.mesh), trail)
            return _Staged(jax.device_put(a), trail)

        return put(X), put(Y), put(feats)

    def run_epoch_resident(self, state, X_dev, Y_dev, F_dev, perm, kind, batch_size):
        """Epoch over staged device data with a host-provided permutation
        (pass np.arange(N) for no shuffle, e.g. validation)."""
        X_dev, Y_dev, F_dev = as_staged(X_dev), as_staged(Y_dev), as_staged(F_dev)
        if X_dev.dev.shape[0] // batch_size == 0:
            return state, 0.0
        state, loss = self._epoch_scan_resident[kind](
            state,
            X_dev.dev,
            Y_dev.dev,
            F_dev.dev if F_dev is not None else None,
            jnp.asarray(perm),
            has_feats=F_dev is not None,
            batch_size=batch_size,
            trails=(
                X_dev.trail,
                Y_dev.trail,
                F_dev.trail if F_dev is not None else None,
            ),
        )
        return state, float(loss)

    def run_epoch_scanned(self, state, X, Y, feats, kind: str, batch_size: int):
        """Scan-mode run_epoch: same semantics (drop last partial batch),
        one compile + one dispatch per epoch."""
        nb = X.shape[0] // batch_size
        n = nb * batch_size
        if nb == 0:  # dataset smaller than a batch: match run_epoch's 0.0
            return state, 0.0

        shard = None
        if self.mesh is not None and self.mesh.devices.size > 1:
            n_data = self.mesh.shape["data"]
            if batch_size % n_data == 0:
                from jax.sharding import NamedSharding, PartitionSpec as P

                shard = NamedSharding(self.mesh, P(None, "data"))

        def stack(a):
            a = jnp.asarray(a[:n].reshape((nb, batch_size) + a.shape[1:]))
            return jax.device_put(a, shard) if shard is not None else a

        Xb, Yb = stack(X), stack(Y)
        Fb = stack(feats) if feats is not None else None
        state, loss = self._epoch_scan[kind](
            state, Xb, Yb, Fb, has_feats=feats is not None
        )
        return state, float(loss)

    def grad_flow(self, state, x, y, feats=None, rng=None):
        """Per-layer |grad| stats of the ACTUAL training loss (train-mode
        BN/dropout + adversarial term) — the wandb.watch gradient-logging
        analog (reference train_gan.py:81,96 + viz/track_grads.py).
        The gradient function is jitted once per feats-arity and takes all
        data as arguments, so repeated logging epochs don't recompile."""
        from multimodal_hand_pose_enhancement_for_sign_language_tpu.viz import (
            track_grads,
        )

        has_feats = feats is not None
        if not hasattr(self, "_grad_flow_fn"):
            self._grad_flow_fn = {}
        if has_feats not in self._grad_flow_fn:
            def gfn(state, x, y, feats, key):
                return jax.grad(self._g_loss, has_aux=True)(
                    state["g_params"], state, x, y, feats, key
                )[0]

            self._grad_flow_fn[has_feats] = jax.jit(gfn)
        key = jax.random.PRNGKey(0) if rng is None else rng
        grads = self._grad_flow_fn[has_feats](
            state,
            jnp.asarray(x),
            jnp.asarray(y),
            jnp.asarray(feats) if has_feats else None,
            key,
        )
        return track_grads.grad_flow_stats(grads)

    # ------------------------------------------------------------------
    # host-side epoch driver helpers
    # ------------------------------------------------------------------
    def _device_batch(self, arr):
        if self.mesh is not None and self.mesh.devices.size > 1:
            n_data = self.mesh.shape["data"]
            if arr.shape[0] % n_data == 0:
                return mesh_lib.shard_batch(arr, self.mesh)
            # batch not divisible by the data axis: fall back to replication
            # (correctness first; the driver picks divisible batch sizes for
            # production runs)
            return mesh_lib.replicate(jnp.asarray(arr), self.mesh)
        return jnp.asarray(arr)

    def run_epoch(self, state, X, Y, feats, kind: str, batch_size: int):
        """One pass over (N, T, D)-layout numpy arrays.  Drops the last
        incomplete batch (reference integer-division semantics)."""
        n_batches = X.shape[0] // batch_size
        total = 0.0
        step = {"g": self._g_step, "d": self._d_step}.get(kind)
        for bi in range(n_batches):
            sl = slice(bi * batch_size, (bi + 1) * batch_size)
            x = self._device_batch(X[sl])
            y = self._device_batch(Y[sl])
            f = self._device_batch(feats[sl]) if feats is not None else None
            if kind == "val":
                loss = self._val_step(state, x, y, f)
            else:
                state, loss = step(state, x, y, f)
            total += float(loss) * batch_size
        avg = total / max(n_batches * batch_size, 1)
        return state, avg
