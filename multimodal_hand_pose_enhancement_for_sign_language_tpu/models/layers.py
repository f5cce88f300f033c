"""PyTorch-semantics building blocks as flax.linen modules (NLC layout).

The reference models are stacks of
``Dropout(0.5) -> Conv1d -> LeakyReLU(0.2) -> BatchNorm1d [-> MaxPool1d]``
(modelZoo.py:29-118 etc.).  These blocks reproduce PyTorch's numerical
semantics exactly in eval mode so reference checkpoints can be ported and
verified:

  * Conv1d with explicit symmetric padding (PyTorch "padding=p"),
  * ConvTranspose1d(k, stride=2, padding=3, output_padding=1) realized as
    an input-dilated convolution with a flipped kernel and asymmetric
    padding (k-1-p, k-1-p+output_padding),
  * BatchNorm with PyTorch's momentum convention (torch m=0.1 == flax
    momentum 0.9; the text branches' m=0.01 == 0.99) and eps=1e-5,
  * torch-default initializers (kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))).

Layout: (batch, time, channels).  Channels ride the TPU lane dimension and
convs lower to MXU matmuls; the (B, D, T) reference layout is transposed
once at the model boundary.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# ---------------------------------------------------------------------------
# Per-layer matmul-precision policy.
#
# TPU matmul precision is a real operating point: one bf16 MXU pass
# (DEFAULT/'bfloat16') is ~2x faster than three ('tensorfloat32') but its
# end-to-end MPJPE misses the 1e-3 parity budget (TPU_PROBE.json
# "mpjpe_by_precision_traced_inside").  If only *some* layers carry the
# error, a mixed assignment sits between the two blanket points.  The
# overrides map flax module-path substrings (e.g. "decoder/Conv1d_0") to a
# precision string ('bfloat16' | 'tensorfloat32' | 'float32'); the longest
# matching key wins.  Binding happens at TRACE time — wrap the traced
# apply, exactly like jax.default_matmul_precision.
# ---------------------------------------------------------------------------

_precision_overrides = threading.local()


@contextmanager
def matmul_precision_overrides(overrides):
    """Trace-time per-layer matmul precision, keyed by flax module-path
    components.  `None` values mean "inherit the ambient context".

    Keys match whole path components: "decoder/Conv1d_0" matches the
    decoder's first conv and nothing else; "Conv1d_1" does NOT match
    "Conv1d_10".  The longest matching key wins (length measured after
    stripping decorative slashes, so "/Conv1d_0/" and "Conv1d_0" are
    equally specific).  A winning key mapped to None SHADOWS shorter
    matches: {"decoder": "float32", "decoder/Conv1d_0": None} runs
    Conv1d_0 at the ambient precision, not float32 — the explicit way to
    exempt one layer from a broader override.

    CACHING CAVEAT: unlike ``jax.default_matmul_precision`` this context
    is NOT part of jit's cache key — a function traced outside (or under
    different overrides) will be silently reused from the compiled
    cache.  Create a fresh jitted closure per override set, the way
    ``tpu_precision_sweep.py`` does; this is a measurement/experiment
    knob, not ambient configuration."""
    prev = getattr(_precision_overrides, "value", None)
    _precision_overrides.value = dict(overrides)
    try:
        yield
    finally:
        _precision_overrides.value = prev


def _resolve_precision(path) -> Optional[Any]:
    overrides = getattr(_precision_overrides, "value", None)
    if not overrides:
        return None
    joined = "/" + "/".join(str(p) for p in path) + "/"
    best, best_len = None, -1
    for key, val in overrides.items():
        # specificity = stripped length, so decorative slashes in the
        # key ('/Conv1d_0/') don't outrank equally-specific bare keys
        stripped = key.strip("/")
        if "/" + stripped + "/" in joined and len(stripped) > best_len:
            best, best_len = val, len(stripped)
    return None if best is None else jax.lax.Precision(best)


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """U(-b, b) with b = 1/sqrt(fan_in); flax Conv kernel shape (k, in, out)."""
    fan_in = shape[0] * shape[1]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_dense_kernel_init(key, shape, dtype=jnp.float32):
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _torch_bias_init(fan_in):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv1d(nn.Module):
    """PyTorch-equivalent Conv1d on (B, T, C) input."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            torch_conv_kernel_init,
            (self.kernel_size, in_ch, self.features),
        )
        bias = self.param(
            "bias", _torch_bias_init(in_ch * self.kernel_size), (self.features,)
        )
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            precision=_resolve_precision(self.path),
        )
        return y + bias


class ConvTranspose1d(nn.Module):
    """PyTorch-equivalent ConvTranspose1d on (B, T, C) input.

    Equivalent to `lax.conv_general_dilated` with lhs_dilation=stride,
    kernel flipped along the window axis, and padding
    (k-1-p, k-1-p+output_padding).  For the reference decoder
    (k=7, s=2, p=3, op=1) the output length is exactly 2*T.
    """

    features: int
    kernel_size: int
    stride: int = 2
    padding: int = 3
    output_padding: int = 1
    # Even/odd sub-pixel decomposition of the stride-2 form.  Evaluated
    # and REJECTED as the default: although XLA lowers the lhs-dilated
    # conv densely (paying a MAC for every inserted zero — the dense-count
    # roofline in TPU_PROBE.json "layers_high" confirms it), the two
    # half-size convs + interleave lower WORSE on the MXU and measured
    # slower at every precision, both isolated (TPU_PROBE.json
    # "convT_decomposition_isolated": 4.05 vs 3.52 ms at high) and inside
    # the full training graph.  Kept behind this flag so the exactness
    # test documents the measured decision.
    decompose: bool = False

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]

        def kernel_init(key, shape, dtype=jnp.float32):
            # torch ConvTranspose1d weight is (in, out, k) and fan_in is
            # computed from dim 1: fan_in = out_ch * k.
            bound = 1.0 / jnp.sqrt(shape[2] * shape[0])
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        kernel = self.param(
            "kernel", kernel_init, (self.kernel_size, in_ch, self.features)
        )
        bias = self.param(
            "bias", _torch_bias_init(self.features * self.kernel_size), (self.features,)
        )
        lo = self.kernel_size - 1 - self.padding
        hi = self.kernel_size - 1 - self.padding + self.output_padding
        flipped = kernel[::-1, :, :]
        T_in = x.shape[1]
        out_len = (T_in - 1) * self.stride - 2 * self.padding + self.kernel_size + self.output_padding
        if self.decompose and self.stride == 2 and out_len == 2 * T_in:
            # With stride 2, output phase r in {0, 1} sees only
            # alternating kernel taps:
            #   y[2m + r] = sum_j x[m + (r + j - lo)//2] * W'[j]
            #   over taps j with (r + j - lo) even  (W' = flipped kernel)
            # so two half-size convs + an interleave perform the same
            # multiplies and adds with no zeros — exact to within
            # float addition order.  Valid whenever out_len == 2*T_in
            # (k + output_padding - 2*padding == 2; the reference decoder
            # config k=7, p=3, op=1 qualifies).  See `decompose` above for
            # why this is off by default.
            ys = []
            for r in range(2):
                taps = [j for j in range(self.kernel_size) if (r + j - lo) % 2 == 0]
                shifts = [(r + j - lo) // 2 for j in taps]  # consecutive ints
                wk = jnp.stack([flipped[j] for j in taps])  # (k_r, in, out)
                yr = jax.lax.conv_general_dilated(
                    x,
                    wk,
                    window_strides=(1,),
                    padding=[(-shifts[0], shifts[-1])],
                    dimension_numbers=("NWC", "WIO", "NWC"),
                    precision=_resolve_precision(self.path),
                )
                ys.append(yr)
            y = jnp.stack(ys, axis=2).reshape(x.shape[0], 2 * T_in, self.features)
        else:
            y = jax.lax.conv_general_dilated(
                x,
                flipped,
                window_strides=(1,),
                padding=[(lo, hi)],
                lhs_dilation=(self.stride,),
                dimension_numbers=("NWC", "WIO", "NWC"),
                precision=_resolve_precision(self.path),
            )
        return y + bias


class BatchNorm(nn.Module):
    """BatchNorm over all non-channel axes with torch semantics.

    `torch_momentum` is PyTorch's momentum (fraction of the *new* batch
    statistic); flax-style running-average momentum is 1 - torch_momentum.
    Running variance is updated with the unbiased batch variance, like
    PyTorch; normalization uses the biased one.
    """

    torch_momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        ch = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (ch,))
        bias = self.param("bias", nn.initializers.zeros, (ch,))
        ra_mean = self.variable("batch_stats", "mean", jnp.zeros, ch)
        ra_var = self.variable("batch_stats", "var", jnp.ones, ch)

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            reduce_axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=reduce_axes)
            var = jnp.mean(jnp.square(x - mean), axis=reduce_axes)
            n = x.size // ch
            unbiased = var * (n / max(n - 1, 1))
            if not self.is_initializing():
                m = self.torch_momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        inv = jax.lax.rsqrt(var + self.eps)
        return (x - mean) * inv * scale + bias


class Dense(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        kernel = self.param("kernel", torch_dense_kernel_init, (in_f, self.features))
        bias = self.param("bias", _torch_bias_init(in_f), (self.features,))
        return x @ kernel + bias


def leaky_relu(x, negative_slope=0.2):
    return jnp.where(x >= 0, x, negative_slope * x)


def max_pool_time(x, window=2, stride=2):
    """MaxPool1d over the time axis of (B, T, C)."""
    return nn.max_pool(x, window_shape=(window,), strides=(stride,), padding="VALID")


def upsample_repeat(x, target_len):
    """repeat_interleave(2) along time, truncated to target_len
    (modelZoo.py:294-296)."""
    y = jnp.repeat(x, 2, axis=1)
    return y[:, :target_len, :]


class ConvBlock(nn.Module):
    """Dropout(0.5) -> Conv1d -> LeakyReLU(0.2) -> BatchNorm [-> MaxPool/2].

    The canonical block of every reference model (modelZoo.py:29-35 etc.).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    pool: bool = False
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        x = Conv1d(self.features, self.kernel_size, self.stride, self.padding)(x)
        x = leaky_relu(x)
        x = BatchNorm()(x, use_running_average=not train)
        if self.pool:
            x = max_pool_time(x)
        return x


class FeatEmbedBlock(nn.Module):
    """Dropout -> Linear -> LeakyReLU -> BatchNorm(momentum 0.01) applied to
    flattened (B*T, E) features — the text/image postprocess branch
    (modelZoo.py:19-24, 182-187)."""

    features: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        x = Dense(self.features)(x)
        x = leaky_relu(x)
        x = BatchNorm(torch_momentum=0.01)(x, use_running_average=not train)
        return x
