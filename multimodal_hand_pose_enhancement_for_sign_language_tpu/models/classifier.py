"""Downstream classifiers: LSTM topic classifier + MLP sentence classifier.

Re-designs of the H2Sclassifier models:
  * ``ClassifLSTM``       — H2Sclassifier/Model/ClassifLSTM.py:5-26:
    stacked (optionally bidirectional) LSTM over r6d sequences + Linear to
    per-timestep logits.  Implemented with flax's scan-fused
    OptimizedLSTMCell (the BASELINE's "lax.scan-fused recurrent cells").
    Torch semantics kept: inter-layer dropout (not after the last layer),
    U(-1/sqrt(hidden), 1/sqrt(hidden)) init for all LSTM weights.
  * ``SentenceClassifier`` — H2Sclassifier/Train_Test/MLP_main.py:17-28:
    Linear(384->256) -> ReLU -> Linear(256->10) -> Sigmoid.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_hand_pose_enhancement_for_sign_language_tpu.models.layers import (
    Dense,
)


def _lstm_uniform(hidden_size):
    bound = 1.0 / jnp.sqrt(hidden_size)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class ClassifLSTM(nn.Module):
    hidden_size: int = 1024
    num_layers: int = 10
    num_classes: int = 10
    bidirectional: bool = True
    dropout: float = 0.0
    # Rematerialize each LSTM layer in the backward pass (jax.checkpoint)
    # instead of saving all (B, T, 8H) activations: the 10-layer bidir
    # default saves ~27 GB at B=128 x T=192 (HBM OOM on a 16 GB chip);
    # with remat the same step fits and recompute rides the MXU.
    remat: bool = False

    @nn.compact
    def __call__(self, seq, train: bool = False):
        """(B, T, D) -> (B, T, num_classes) per-timestep logits.

        torch nn.LSTM carries DUAL biases (bias_ih + bias_hh), each a
        separate Adam parameter.  Because Adam is elementwise, that
        parameterization is reproduced exactly by appending a constant-1
        feature to each layer's input: the extra input-kernel row is
        bias_ih (trained per-entry just like torch's), while the cell's
        own recurrent bias is bias_hh.  This makes both eval outputs AND
        post-Adam training dynamics match torch (see
        tests/test_classifier.py::test_classif_lstm_train_step_parity).
        """
        init = _lstm_uniform(self.hidden_size)
        h = seq
        for layer in range(self.num_layers):
            ones = jnp.ones(h.shape[:-1] + (1,), h.dtype)
            inp = jnp.concatenate([h, ones], axis=-1)

            def run(name, reverse):
                cell = nn.OptimizedLSTMCell(
                    self.hidden_size,
                    kernel_init=init,
                    recurrent_kernel_init=init,
                    bias_init=init,
                    name=f"{name}_cell",
                )
                rnn_cls = nn.remat(nn.RNN) if self.remat else nn.RNN
                rnn = rnn_cls(cell, reverse=reverse, keep_order=True, name=name)
                return rnn(inp)

            fwd = run(f"lstm{layer}_f", False)
            if self.bidirectional:
                bwd = run(f"lstm{layer}_b", True)
                h = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                h = fwd
            # torch nn.LSTM applies dropout between layers, not after the
            # last one
            if self.dropout > 0 and layer < self.num_layers - 1:
                h = nn.Dropout(rate=self.dropout, deterministic=not train)(h)
        B, T, _ = h.shape
        y = Dense(self.num_classes, name="Linear")(h.reshape(B * T, -1))
        return y.reshape(B, T, self.num_classes)


class SentenceClassifier(nn.Module):
    in_dim: int = 384
    hidden: int = 256
    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Dense(self.hidden, name="fc1")(x)
        x = nn.relu(x)
        x = Dense(self.num_classes, name="fc2")(x)
        return nn.sigmoid(x)
