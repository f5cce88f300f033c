#!/usr/bin/env python
"""Per-layer cost breakdown of the v1 forward on the real TPU.

Methodology note (round 2): the axon tunnel adds a large (~30 ms)
per-call overhead, so every number here uses the DIFFERENCE method —
time a program that chains K2 data-dependent iterations and one that
chains K1, and report (T(K2) - T(K1)) / (K2 - K1).  The constant
overhead (dispatch RPC + scalar fetch + loop prologue) cancels exactly.
Matmul precision is always passed EXPLICITLY to the op (trace-time
binding) — `with jax.default_matmul_precision(...)` around a lazy
`jax.jit` definition does NOT apply to tracing that happens at the
first call outside the context; that bug invalidated the r2
"forward_throughput_by_precision" numbers and bench.py's precision
claim (both fixed this round).

Phases (each appends to TPU_PROBE.json as it lands):
  0. overhead — the per-call constant itself (for the record).
  1. mxu      — square-matmul TFLOP/s at DEFAULT/HIGH/HIGHEST f32 + bf16.
  2. train    — G/D step at B=256 under threefry vs rbg PRNG; train-mode
                vs eval-mode forward (dropout-mask cost hypothesis).
  3. layers   — isolated per-op timings of the v1 forward at B=2048.
  4. whole    — the full eval forward at each precision, with true rates.

Run on the chip:  python tpu_probe_forward.py [phase ...]
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

OUT = "TPU_PROBE.json"
RESULTS: dict = {}
B, T = 2048, 192
K1, K2 = 8, 40


def emit(key, value):
    RESULTS[key] = value
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(json.dumps({key: value}), flush=True)


def _fetch(r):
    leaves = jax.tree.leaves(r)
    float(jnp.sum(leaves[0]) if leaves[0].ndim else leaves[0])


def time_call(f, *args, reps=3):
    """Best wall-clock of one f(*args) call, synced by a scalar fetch."""
    r = f(*args)
    _fetch(r)  # compile + warm
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f(*args)
        _fetch(r)
        best = min(best, time.perf_counter() - t0)
    return best


def chain(op, K):
    """K data-dependent applications of op inside one jitted program.
    The carry keeps its shape; the FULL mean of each output folds back
    in (at 1e-30 scale, numerically inert) so no part of any iteration
    can be dead-code-eliminated.  Empirical check that the mean is not
    algebraically folded through the op: the r2 matmul timings scale
    exactly with the precision pass count, so the matmuls really run."""

    def many(x, *w):
        def body(i, carry):
            y = op(carry, *w)
            return carry + jnp.mean(y) * 1e-30

        return jax.lax.fori_loop(0, K, body, x)

    return jax.jit(many)


def diff_time(op, *args, k1=K1, k2=K2, reps=3):
    """Seconds per op application, tunnel overhead cancelled."""
    t1 = time_call(chain(op, k1), *args, reps=reps)
    t2 = time_call(chain(op, k2), *args, reps=reps)
    return (t2 - t1) / (k2 - k1), t1, t2


def phase_overhead():
    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda x: x + 1.0)
    per_call = time_call(f, x, reps=5)
    emit("tunnel_overhead_ms_per_call", round(per_call * 1e3, 2))


def phase_mxu():
    out = {}
    N = 4096
    a = jax.random.normal(jax.random.PRNGKey(0), (N, N), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (N, N), jnp.float32)
    flops = 2 * N * N * N
    for name, prec, dt in (
        ("f32_default", "default", jnp.float32),
        ("f32_high", "high", jnp.float32),
        ("f32_highest", "highest", jnp.float32),
        ("bf16", "default", jnp.bfloat16),
    ):
        aa, bb = a.astype(dt), b.astype(dt)

        def op(x, w, prec=prec, dt=dt):
            return jnp.dot(x, w, precision=prec, preferred_element_type=dt)

        s, t1, t2 = diff_time(op, aa, bb)
        out[f"{name}_tflops"] = round(flops / s / 1e12, 1)
        out[f"{name}_ms"] = round(s * 1e3, 3)
    emit("mxu_matmul_4096", out)


def phase_train():
    from multimodal_hand_pose_enhancement_for_sign_language_tpu.models import registry
    from multimodal_hand_pose_enhancement_for_sign_language_tpu.train.gan import (
        GanConfig,
        GanTrainer,
    )

    Bt = 256
    out = {}

    # dropout-mask generation alone: 10 masks over (256, 96, 256).
    # The key is folded from the (loop-carried) carry so mask generation
    # cannot be hoisted out of the chain loop as loop-invariant.
    for impl in ("threefry2x32", "rbg"):
        key = jax.random.key(0, impl=impl)

        def op(carry, key):
            k = jax.random.fold_in(key, carry.reshape(-1)[0].astype(jnp.int32))
            total = jnp.zeros((), jnp.float32)
            for i in range(10):
                k, sub = jax.random.split(k)
                total += jnp.sum(jax.random.bernoulli(sub, 0.5, (Bt, 96, 256)))
            return total[None]

        s, _, _ = diff_time(op, jnp.zeros((1,)), key)
        out[f"ten_masks_ms_{impl}"] = round(s * 1e3, 3)

    # train-mode vs eval-mode forward
    module = registry.build_generator("v1", 36, 252)
    variables = registry.init_generator(module, jax.random.PRNGKey(0), batch=2, T=T)
    x = jnp.asarray(np.random.RandomState(0).randn(Bt, T, 36).astype(np.float32))
    for impl in ("threefry2x32", "rbg"):
        key = jax.random.key(0, impl=impl)

        def op(carry, v, key):
            k = jax.random.fold_in(key, carry.reshape(-1)[0].astype(jnp.int32))
            y, _ = module.apply(
                v, x + carry.reshape(-1)[0] * 1e-30, None, True,
                rngs={"dropout": k}, mutable=["batch_stats"],
            )
            return y  # chain() folds mean(y): the whole output survives

        s, _, _ = diff_time(op, jnp.zeros((1,)), variables, key)
        out[f"train_fwd_ms_{impl}"] = round(s * 1e3, 3)

    def op_eval(carry, v):
        return module.apply(v, x + carry.reshape(-1)[0] * 1e-30, None, False)

    s, _, _ = diff_time(op_eval, jnp.zeros((1,)), variables)
    out["eval_fwd_ms_B256"] = round(s * 1e3, 3)

    # full G/D steps: K-step loops with one fetch, difference method
    y = jnp.asarray(np.random.RandomState(1).randn(Bt, T, 252).astype(np.float32))

    def steps_ms(tr, which, k1=4, k2=20):
        step = tr._g_step if which == "g" else tr._d_step

        def run(k):
            state = tr.init_state()
            step(state, x, y, None)  # compile (donated state: fresh each run)

            def go():
                st = tr.init_state()
                t0 = time.perf_counter()
                for _ in range(k):
                    st, loss = step(st, x, y, None)
                float(loss)
                return time.perf_counter() - t0

            go()
            return min(go() for _ in range(2))

        return (run(k2) - run(k1)) / (k2 - k1)

    for impl in ("threefry2x32", "rbg"):
        with jax.default_prng_impl(impl):
            tr = GanTrainer(GanConfig(batch_size=Bt))
            out[f"g_step_ms_{impl}"] = round(steps_ms(tr, "g") * 1e3, 3)
            out[f"d_step_ms_{impl}"] = round(steps_ms(tr, "d") * 1e3, 3)

    emit("train_step_breakdown", out)


def _conv(x, w, stride=1, pad=1, lhs_dilation=None, prec="default"):
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=[(pad, pad)] if isinstance(pad, int) else [pad],
        lhs_dilation=lhs_dilation,
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=prec,
    )


def phase_layers(precision):
    rng = np.random.RandomState(0)

    def arr(*shape):
        return jnp.asarray(rng.randn(*shape).astype(np.float32))

    layers = {}

    def g_macs(t_out, k, cin, cout):
        return B * t_out * k * cin * cout / 1e9

    specs = [
        ("enc_conv_k3_36_256_T192", arr(B, T, 36), arr(3, 36, 256), dict(), g_macs(192, 3, 36, 256)),
        ("conv_k3_256_256_T96", arr(B, 96, 256), arr(3, 256, 256), dict(), g_macs(96, 3, 256, 256)),
        ("conv7_k5_s2_256_256_T96", arr(B, 96, 256), arr(5, 256, 256), dict(pad=2, stride=2), g_macs(48, 5, 256, 256)),
        ("convT_k7_s2_256_252_T96", arr(B, 96, 256), arr(7, 256, 252), dict(pad=(3, 4), lhs_dilation=(2,)), g_macs(96, 7, 256, 252)),
        ("final_k7_252_252_T192", arr(B, T, 252), arr(7, 252, 252), dict(pad=3), g_macs(192, 7, 252, 252)),
    ]
    for name, x, w, kw, gm in specs:
        def op(x, w, kw=kw):
            return _conv(x, w, prec=precision, **kw)

        s, _, _ = diff_time(op, x, w)
        layers[name] = {
            "ms": round(s * 1e3, 3),
            "gmacs": round(gm, 1),
            "eff_tflops": round(2 * gm / s / 1e3, 1),
        }

    xb = arr(B, 96, 256)
    ab = arr(1, 1, 256)
    s, _, _ = diff_time(lambda x, a: jnp.where(x >= 0, x, 0.2 * x) * a + a, xb, ab)
    layers["elemwise_lrelu_affine_T96"] = {"ms": round(s * 1e3, 3)}

    xb2 = arr(B, T, 256)
    s, _, _ = diff_time(lambda x, a: jnp.where(x >= 0, x, 0.2 * x) * a + a, xb2, ab)
    layers["elemwise_lrelu_affine_T192"] = {"ms": round(s * 1e3, 3)}

    s, _, _ = diff_time(
        lambda x, a: jnp.repeat(x.reshape(B, 96, 2, 256).max(axis=2), 2, axis=1), xb2, ab
    )
    layers["maxpool2_plus_repeat_T192"] = {"ms": round(s * 1e3, 3)}

    emit(f"layers_{precision}", layers)


def phase_whole(precision):
    from multimodal_hand_pose_enhancement_for_sign_language_tpu.models import registry

    module = registry.build_generator("v1", 36, 252)
    variables = registry.init_generator(module, jax.random.PRNGKey(0), batch=2, T=T)
    x = jnp.asarray(np.random.RandomState(0).randn(B, T, 36).astype(np.float32))

    def op(carry, v):
        with jax.default_matmul_precision(precision):
            # chain() folds mean(y): unlike a y[:, :, :36] slice, no
            # output channel of the final conv can be dead-code-eliminated
            return module.apply(v, carry, None, False)

    # trace-time precision: the context wraps the APPLY inside the traced
    # function body, so it binds regardless of when jit traces
    s, _, _ = diff_time(op, x, variables)
    emit(
        f"whole_forward_{precision}",
        {"ms": round(s * 1e3, 3), "frames_per_s": round(B * T / s)},
    )


def main():
    phases = sys.argv[1:] or ["overhead", "mxu", "train", "layers", "whole"]
    if "overhead" in phases:
        phase_overhead()
    if "mxu" in phases:
        phase_mxu()
    if "train" in phases:
        phase_train()
    if "layers" in phases:
        for precision in ("default", "high", "highest"):
            phase_layers(precision)
    if "whole" in phases:
        for precision in ("bfloat16", "tensorfloat32", "float32"):
            phase_whole(precision)


if __name__ == "__main__":
    main()
