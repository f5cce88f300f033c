#!/usr/bin/env python
"""Isolated decomposed-vs-dilated ConvTranspose1d timing on the chip
(difference method).  Appends to TPU_PROBE.json."""

import json
import time

import numpy as np

from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils.platform import (
    ensure_platform_from_env,
)

ensure_platform_from_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodal_hand_pose_enhancement_for_sign_language_tpu.models.layers import (  # noqa: E402
    ConvTranspose1d,
)

B, T, CIN, COUT = 2048, 96, 256, 252
K1, K2 = 8, 40


def time_call(f, *args, reps=3):
    r = f(*args)
    float(jnp.sum(r))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f(*args)
        float(jnp.sum(r))
        best = min(best, time.perf_counter() - t0)
    return best


def chain(op, K):
    def many(x, *w):
        def body(i, carry):
            return carry + jnp.mean(op(carry, *w)) * 1e-30

        return jax.lax.fori_loop(0, K, body, x)

    return jax.jit(many)


def diff_time(op, *args):
    t1 = time_call(chain(op, K1), *args)
    t2 = time_call(chain(op, K2), *args)
    return (t2 - t1) / (K2 - K1)


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, CIN).astype(np.float32))
    m = ConvTranspose1d(COUT, 7, stride=2, padding=3, output_padding=1,
                        decompose=True)
    v = m.init(jax.random.PRNGKey(0), x)
    kern = v["params"]["kernel"]
    bias = v["params"]["bias"]

    out = {}
    for prec in ("default", "high"):
        def decomposed(xc, kern, bias):
            with jax.default_matmul_precision(
                {"default": "bfloat16", "high": "tensorfloat32"}[prec]
            ):
                y = m.apply({"params": {"kernel": kern, "bias": bias}}, xc)
            # project back to carry shape for the chain (mean used anyway)
            return y

        def dilated(xc, kern, bias):
            return (
                jax.lax.conv_general_dilated(
                    xc,
                    kern[::-1, :, :],
                    (1,),
                    [(3, 4)],
                    lhs_dilation=(2,),
                    dimension_numbers=("NWC", "WIO", "NWC"),
                    precision=prec,
                )
                + bias
            )

        out[f"decomposed_ms_{prec}"] = round(diff_time(decomposed, x, kern, bias) * 1e3, 3)
        out[f"dilated_ms_{prec}"] = round(diff_time(dilated, x, kern, bias) * 1e3, 3)

    results = json.load(open("TPU_PROBE.json"))
    results["convT_decomposition_isolated"] = out
    with open("TPU_PROBE.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
