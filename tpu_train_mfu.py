#!/usr/bin/env python
"""Train-step MFU / roofline fractions on the real TPU (VERDICT r4 #7).

The forward pass is already pinned at ~87% of its 3-pass MXU roofline
(TPU_PROBE "whole_forward_*" + layer breakdown).  This records the same
accounting for the two TRAIN steps:

  * the GAN G-step and D-step at the article operating point
    (v1, arm2wh: B=256, T=192, default one-bf16-pass matmul precision,
    rbg dropout RNG — the configuration the 106.9 s / 200-epoch
    article-scale record used), and
  * the LSTM classifier step at the reference's own config
    (hidden 1024 x 10 layers x bidir, remat, B=32 and the remat'd
    B=128 production point; reference
    H2Sclassifier/Train_Test/main.py:143-160).

FLOP counts come from XLA's own cost model of the COMPILED program
(`compiled.cost_analysis()["flops"]`), so remat recompute and the
backward pass are counted as executed, not idealized.  Step time uses
the repo's standard difference method (K2-vs-K1 chained steps, tunnel
overhead cancels; see tpu_probe_forward.py).  The roofline denominator
is the measured MXU calibration at the step's matmul precision
(TPU_PROBE "mxu_matmul_4096": 213 TFLOP/s default one-bf16-pass).

Appends {"train_step_mfu": ...} to TPU_PROBE.json (load-then-update;
unlike the r2.5 probes this must not clobber sibling records).
"""

import json
import os
import time

import numpy as np

from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils.platform import (
    ensure_platform_from_env,
)

ensure_platform_from_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

OUT = "TPU_PROBE.json"
MXU_DEFAULT_TFLOPS = 213.0  # measured one-bf16-pass calibration (phase_mxu)


def emit(key, value):
    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)
    results[key] = value
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({key: value}), flush=True)


def compiled_flops(jitted, *args):
    c = jitted.lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca["flops"])


def scan_steps_ms(step_impl, make_state, x, y, k1=32, k2=160):
    """Difference-method ms per step, with the K steps chained in ONE
    lax.scan program (one dispatch + one scalar fetch per measurement).

    The per-call Python-loop methodology was measured NOT to survive
    tunnel variance (TPU_PROBE 'train_step_breakdown' note; a first run
    of this script under host contention even produced a negative
    difference): each dispatch pays ~31 ms of jittery tunnel overhead
    that swamps a ~2-4 ms step.  Scanning K steps on device leaves only
    two dispatches total per timing, so the k2-k1 difference is pure
    device time."""
    import functools

    @functools.partial(jax.jit, static_argnames=("k",))
    def run_k(state, xx, yy, k):
        def body(st, i):
            # Defeat XLA's while-loop invariant code motion: computations
            # that depend only on (xx, yy) and loop-invariant carry leaves
            # get hoisted out of the scan — the first run of this probe
            # recorded the D step at 1.16x the MXU roofline because the
            # generator forward (G params never update in a D step) ran
            # ONCE outside the loop while cost_analysis counted it per
            # step.  A per-iteration dynamic scale on the inputs keeps
            # every input-derived computation inside the loop; the scale
            # itself fuses into the first consumers (~1e-4 of step FLOPs).
            sc = 1.0 + i.astype(xx.dtype) * 1e-12
            st, loss = step_impl(st, xx * sc, yy * sc, None)
            return st, loss

        state, losses = jax.lax.scan(body, state, jnp.arange(k))
        return losses[-1]

    xd, yd = jax.device_put(x), jax.device_put(y)

    def run(k):
        float(run_k(make_state(), xd, yd, k=k))  # compile + warm

        def go():
            st = make_state()
            t0 = time.perf_counter()
            loss = run_k(st, xd, yd, k=k)
            float(loss)  # fetch = sync through the tunnel
            return time.perf_counter() - t0

        return min(go() for _ in range(3))

    # Adaptive scan length: the k2-k1 difference must dominate the
    # per-measurement tunnel fetch jitter (tens of ms; the first
    # fixed-k run measured a NEGATIVE d_step at k2-k1=128 because a
    # ~1 ms step leaves only ~140 ms of signal).  Double k2 until the
    # difference itself exceeds 0.5 s of device time.
    while True:
        diff = run(k2) - run(k1)
        if diff > 0.5 or k2 >= 4096:
            return diff / (k2 - k1) * 1e3
        k1, k2 = k2, k2 * 4


def gan_mfu():
    from multimodal_hand_pose_enhancement_for_sign_language_tpu.train.gan import (
        GanConfig,
        GanTrainer,
    )

    Bt, T = 256, 192
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(Bt, T, 36).astype(np.float32))
    y = jnp.asarray(rng.randn(Bt, T, 252).astype(np.float32))
    out = {}
    with jax.default_prng_impl("rbg"):
        tr = GanTrainer(GanConfig(batch_size=Bt))
        for which, step, impl in (
            ("g_step", tr._g_step, tr._g_step_impl),
            ("d_step", tr._d_step, tr._d_step_impl),
        ):
            flops = compiled_flops(step, tr.init_state(), x, y, None)
            ms = scan_steps_ms(impl, tr.init_state, x, y)
            tflops = flops / (ms * 1e-3) / 1e12
            out[which] = {
                "ms": round(ms, 3),
                "xla_gflops": round(flops / 1e9, 2),
                "achieved_tflops": round(tflops, 2),
                "mxu_fraction_default": round(tflops / MXU_DEFAULT_TFLOPS, 4),
            }
    return out


def classifier_mfu():
    from multimodal_hand_pose_enhancement_for_sign_language_tpu.models.classifier import (
        ClassifLSTM,
    )
    from multimodal_hand_pose_enhancement_for_sign_language_tpu.train.classifier import (
        ClassifierTrainer,
    )

    T, D = 192, 288
    out = {}
    for Bt in (32, 128):
        m = ClassifLSTM(hidden_size=1024, num_layers=10, num_classes=10,
                        bidirectional=True, remat=True)
        tr = ClassifierTrainer(m, learning_rate=1e-3)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(Bt, T, D).astype(np.float32))
        yl = jnp.asarray(rng.randint(0, 10, size=Bt).astype(np.int32))
        key = jax.random.PRNGKey(3)
        params, opt = tr.init_state(jax.random.PRNGKey(0), x[:2])

        flops = compiled_flops(tr._train_step, params, opt, x, yl, key)

        def make_state():
            p, o = tr.init_state(jax.random.PRNGKey(0), x[:2])
            return p, o

        def run(k):
            p, o = make_state()
            tr._train_step(p, o, x, yl, key)  # compile

            def go():
                pp, oo = make_state()
                t0 = time.perf_counter()
                for _ in range(k):
                    pp, oo, loss, acc = tr._train_step(pp, oo, x, yl, key)
                float(loss)
                return time.perf_counter() - t0

            go()
            return min(go() for _ in range(2))

        ms = (run(8) - run(2)) / 6 * 1e3
        tflops = flops / (ms * 1e-3) / 1e12
        out[f"B{Bt}_refcfg_remat"] = {
            "ms": round(ms, 3),
            "xla_gflops": round(flops / 1e9, 2),
            "achieved_tflops": round(tflops, 2),
            "mxu_fraction_default": round(tflops / MXU_DEFAULT_TFLOPS, 4),
        }
    return out


def main():
    rec = {
        "mxu_calibration_tflops_default": MXU_DEFAULT_TFLOPS,
        "method": "XLA compiled-module flops / difference-method step time",
        "gan_v1_B256_T192_rbg": gan_mfu(),
        "classifier_lstm_1024x10_bidir": classifier_mfu(),
    }
    emit("train_step_mfu", rec)


if __name__ == "__main__":
    main()
