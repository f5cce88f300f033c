"""Training loops for the downstream classifiers.

Re-design of H2Sclassifier/Train_Test (train_epoch.py:8-33,
val_epoch.py:7-36, main.py:23-140, MLP_main.py): jitted train/val steps,
cross-entropy on the LAST timestep's logits (labels shifted -1), accuracy
accounting, best-val-accuracy checkpointing and the GT/pred CSV dump.
"""

from __future__ import annotations

import csv
import os
from dataclasses import dataclass
from itertools import zip_longest
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimodal_hand_pose_enhancement_for_sign_language_tpu.data.io import mkdir
from multimodal_hand_pose_enhancement_for_sign_language_tpu.data.windows import (
    make_equal_len,
    rmv_clips_nan,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.data.io import load_binary
from multimodal_hand_pose_enhancement_for_sign_language_tpu.train.staging import (
    Staged,
    as_staged,
    flatten_rows,
    unflatten_batch,
)

# optimizer registry (reference hyperparameters.py:4-6)
OPTIMIZERS = {
    "Adam": optax.adam,
    "AdamW": optax.adamw,
    "NAdam": optax.nadam,
}


def lstm_activation_bytes(
    batch_size: int,
    seq_len: int,
    hidden_size: int,
    num_layers: int,
    bidirectional: bool,
    dtype_bytes: int = 4,
) -> int:
    """Saved-activation footprint of one ClassifLSTM backward pass
    WITHOUT remat.

    Per layer/direction the scan saves roughly gates (4H) + cell state
    (H) + hidden (H) + output (H) per step, plus the layer's input
    (dirs*H + 1); a 1.5x calibration factor anchors the estimate to the
    on-chip measurement (~27 GB for the reference-default hidden 1024 /
    10 layers / bidir at B=128 x T=192 — TPU_PROBE.json
    "classifier_bench")."""
    dirs = 2 if bidirectional else 1
    per_step = 7 * hidden_size + (dirs * hidden_size + 1)
    return int(
        1.5 * batch_size * seq_len * num_layers * dirs * per_step * dtype_bytes
    )


def should_remat(
    batch_size: int,
    seq_len: int,
    hidden_size: int,
    num_layers: int,
    bidirectional: bool,
    device=None,
    memory_limit_bytes: Optional[int] = None,
    headroom: float = 0.8,
) -> bool:
    """Auto-remat policy: rematerialize LSTM layers when the estimated
    saved-activation footprint exceeds `headroom` x device memory.

    The reference-default classifier config (main.py:143-160: hidden
    1024, 10 layers, bidir, batch 128) needs ~27 GB of activations — an
    HBM OOM on a 16 GB v5e — so the CLI resolves remat='auto' through
    this policy.  `memory_limit_bytes` overrides device introspection
    (tests); on non-TPU backends the answer is False (host RAM pages,
    it doesn't OOM the same way — and the remat exactness test covers
    correctness there)."""
    if memory_limit_bytes is None:
        dev = device if device is not None else jax.devices()[0]
        if dev.platform != "tpu":
            return False
        try:
            stats = dev.memory_stats()
            memory_limit_bytes = stats.get("bytes_limit") if stats else None
        except Exception:
            memory_limit_bytes = None
        if not memory_limit_bytes:
            memory_limit_bytes = 16 * (1 << 30)  # v5e HBM
    need = lstm_activation_bytes(
        batch_size, seq_len, hidden_size, num_layers, bidirectional
    )
    return need > headroom * memory_limit_bytes


def load_data(data_dir: str, data_type: str = "r6d", key: str = "train"):
    """Reference main.py:125-140."""
    f = {
        "r6d": f"r6d_{key}.pkl",
        "grouped_r6d": f"Truer6d_{key}.pkl",
        "wordBert": f"{key}_wordBert_embeddings.pkl",
        "groupedWordBert": f"True{key}_wordBert_embeddings.pkl",
        "groupedxy": f"True_confFalse_xy_{key}.pkl",
    }
    X = load_binary(f"{data_dir}/{f[data_type]}")
    Y = (
        load_binary(f"{data_dir}/Truecategs_{key}.pkl")
        if "grouped" in data_type
        else load_binary(f"{data_dir}/categs_{key}.pkl")
    )
    if data_type not in ("wordBert", "groupedWordBert"):
        X = make_equal_len(
            X, method="cutting+reflect", maxpad=192 * (1 + 10 * (data_type == "grouped_r6d"))
        )
        # Y is a plain category list here, like the reference (main.py:135)
        X, Y, _ = rmv_clips_nan(X, list(Y))
    else:
        X = np.asarray(X)
    return np.asarray(X, np.float32), np.asarray(Y)


@dataclass
class ClassifierTrainer:
    """Jitted step functions around a flax classifier module."""

    module: object
    learning_rate: float = 1e-4
    weight_decay: float = 1e-3
    optimizer: str = "Adam"
    last_timestep_only: bool = True

    def __post_init__(self):
        if self.optimizer == "AdamW":
            # torch AdamW: decoupled weight decay
            self.tx = optax.adamw(self.learning_rate, weight_decay=self.weight_decay)
        else:
            # torch Adam/NAdam couple weight decay as an L2 gradient term
            opt = OPTIMIZERS[self.optimizer](self.learning_rate)
            if self.weight_decay:
                self.tx = optax.chain(
                    optax.add_decayed_weights(self.weight_decay), opt
                )
            else:
                self.tx = opt
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0, 1))
        self._eval_step = jax.jit(self._eval_step_impl)
        # device-resident variants: the full dataset is staged in device
        # memory ONCE and each step receives only a batch-index vector,
        # so a tunnel-attached (or multi-host) run is not bound by
        # per-step host->device batch transfers (28 MB/step at the
        # reference-default B=128 x T=192 x D=288)
        self._train_step_idx = jax.jit(
            self._train_step_idx_impl,
            donate_argnums=(0, 1),
            static_argnames=("trail",),
        )
        self._eval_step_idx = jax.jit(
            self._eval_step_idx_impl, static_argnames=("trail",)
        )

    def init_state(self, rng, sample_x):
        params = self.module.init({"params": rng}, jnp.asarray(sample_x), False)[
            "params"
        ]
        return params, self.tx.init(params)

    def _logits(self, params, x, train, rng=None):
        rngs = {"dropout": rng} if train else None
        y = self.module.apply({"params": params}, x, train, rngs=rngs)
        if self.last_timestep_only and y.ndim == 3:
            y = y[:, -1, :]
        return y

    def _train_step_impl(self, params, opt_state, x, labels, rng):
        def loss_fn(p):
            logits = self._logits(p, x, True, rng)
            loss = jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(logits, labels)
            )
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = jnp.sum(jnp.argmax(logits, axis=-1) == labels)
        return params, opt_state, loss, acc

    def _eval_step_impl(self, params, x, labels):
        logits = self._logits(params, x, False)
        loss = jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        )
        pred = jnp.argmax(logits, axis=-1)
        return loss, jnp.sum(pred == labels), pred

    def _train_step_idx_impl(self, params, opt_state, X, Y, idx, rng, trail=None):
        return self._train_step_impl(
            params, opt_state,
            unflatten_batch(jnp.take(X, idx, axis=0), trail),
            jnp.take(Y, idx, axis=0), rng,
        )

    def _eval_step_idx_impl(self, params, X, Y, idx, trail=None):
        return self._eval_step_impl(
            params,
            unflatten_batch(jnp.take(X, idx, axis=0), trail),
            jnp.take(Y, idx, axis=0),
        )

    # ------------------------------------------------------------------
    def stage(self, X, Y):
        """Upload the dataset to device memory once (labels pre-shifted
        to 0-based).  Use with the *_resident epoch loops; the per-epoch
        shuffle then composes index permutations on the host instead of
        re-uploading data.  X is staged FLATTENED to (N, T*D) — zero
        lane-tile padding and no in-program relayout copy on TPU (see
        train/staging.py) — and each gathered batch is reshaped back to
        (B, T, D) inside the jitted step."""
        flat, trail = flatten_rows(X)
        return (
            Staged(jax.device_put(jnp.asarray(flat)), trail),
            jnp.asarray(np.asarray(Y) - 1),
        )

    # ------------------------------------------------------------------
    def train_epoch(self, params, opt_state, X, Y, batch_size, rng_key):
        """One pass; labels are 1-based on disk, shifted -1 here
        (reference train_epoch.py:19)."""
        batchinds = np.arange(X.shape[0] // batch_size)
        losses, acc = [], 0
        for bi in batchinds:
            sl = slice(bi * batch_size, (bi + 1) * batch_size)
            rng_key, sub = jax.random.split(rng_key)
            params, opt_state, loss, a = self._train_step(
                params, opt_state, jnp.asarray(X[sl]), jnp.asarray(Y[sl] - 1), sub
            )
            losses.append(float(loss))
            acc += int(a)
        denom = max(len(batchinds) * batch_size, 1)
        return params, opt_state, losses, acc / denom, rng_key

    def train_epoch_resident(
        self, params, opt_state, dX, dY, order, batch_size, rng_key
    ):
        """train_epoch over staged device arrays: only (B,)-int index
        vectors cross the host boundary per step.  Identical math to
        train_epoch on X[order] (labels already shifted by stage())."""
        dX = as_staged(dX)
        n_batches = len(order) // batch_size
        losses, acc = [], 0
        for bi in range(n_batches):
            idx = jnp.asarray(order[bi * batch_size : (bi + 1) * batch_size])
            rng_key, sub = jax.random.split(rng_key)
            params, opt_state, loss, a = self._train_step_idx(
                params, opt_state, dX.dev, dY, idx, sub, trail=dX.trail
            )
            losses.append(float(loss))
            acc += int(a)
        denom = max(n_batches * batch_size, 1)
        return params, opt_state, losses, acc / denom, rng_key

    def val_epoch_resident(self, params, dX, dY, batch_size):
        dX = as_staged(dX)
        n_batches = int(dX.dev.shape[0]) // batch_size
        total_loss, acc = 0.0, 0
        GT, predY = [], []
        for bi in range(n_batches):
            idx = jnp.arange(bi * batch_size, (bi + 1) * batch_size)
            loss, a, pred = self._eval_step_idx(
                params, dX.dev, dY, idx, trail=dX.trail
            )
            total_loss += float(loss)
            acc += int(a)
            GT += np.asarray(jnp.take(dY, idx, axis=0)).tolist()
            predY += np.asarray(pred).tolist()
        denom = max(n_batches * batch_size, 1)
        return total_loss, acc / denom, (GT, predY)

    def val_epoch(self, params, X, Y, batch_size):
        batchinds = np.arange(X.shape[0] // batch_size)
        total_loss, acc = 0.0, 0
        GT, predY = [], []
        for bi in batchinds:
            sl = slice(bi * batch_size, (bi + 1) * batch_size)
            labels = Y[sl] - 1
            loss, a, pred = self._eval_step(
                params, jnp.asarray(X[sl]), jnp.asarray(labels)
            )
            total_loss += float(loss)
            acc += int(a)
            GT += labels.tolist()
            predY += np.asarray(pred).tolist()
        denom = max(len(batchinds) * batch_size, 1)
        return total_loss, acc / denom, (GT, predY)


def dump_gt_pred_csv(GT, predY, path="GT_predY.csv"):
    """Reference main.py:107-115."""
    with open(path, "w", encoding="ISO-8859-1", newline="") as f:
        wr = csv.writer(f)
        wr.writerow(("GT", "predY"))
        wr.writerows(zip_longest(GT, predY, fillvalue=""))
    return path
