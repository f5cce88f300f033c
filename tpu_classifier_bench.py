#!/usr/bin/env python
"""Downstream LSTM topic classifier on-chip benchmark (SURVEY L6): one
Adam train step of the reference-default ClassifLSTM (hidden 1024, 10
layers, bidirectional — H2Sclassifier/Train_Test/main.py defaults) at
B=32, T=192, D=252, vs the live torch CPU reference model.

K train steps are chained inside one jitted lax.scan so the ~31 ms/call
axon-tunnel overhead amortizes away; the torch step is timed around bare
fwd+CE+backward+Adam calls.

Appends TPU_PROBE.json["classifier_bench"].
Run on the chip:  python tpu_classifier_bench.py
"""

import json
import time

import numpy as np

from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils.platform import (
    ensure_platform_from_env,
)

ensure_platform_from_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from multimodal_hand_pose_enhancement_for_sign_language_tpu.models.classifier import (  # noqa: E402
    ClassifLSTM,
)

OUT = "TPU_PROBE.json"
B, T, D = 32, 192, 252
HID, LAYERS = 1024, 10
K1, K2 = 2, 8


def measure_tpu():
    module = ClassifLSTM(hidden_size=HID, num_layers=LAYERS)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 10, size=(B,)))
    params = module.init({"params": jax.random.PRNGKey(0)}, x, False)["params"]
    tx = optax.chain(optax.add_decayed_weights(1e-3), optax.adam(1e-4))
    opt_state = tx.init(params)

    def one_step(carry, _):
        params, opt_state = carry

        def loss_fn(p):
            logits = module.apply({"params": p}, x, False)[:, -1, :]
            return jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(logits, labels)
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    def chain(K):
        def many(params, opt_state):
            (params, _), losses = jax.lax.scan(
                one_step, (params, opt_state), None, length=K
            )
            return losses[-1]

        return jax.jit(many)

    def best_of(f, reps=3):
        float(f(params, opt_state))
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(params, opt_state))
            best = min(best, time.perf_counter() - t0)
        return best

    per_step = (best_of(chain(K2)) - best_of(chain(K1))) / (K2 - K1)
    return per_step


def measure_torch():
    import torch

    torch.manual_seed(0)
    lstm = torch.nn.LSTM(D, HID, LAYERS, batch_first=True, bidirectional=True)
    lin = torch.nn.Linear(2 * HID, 10)
    opt = torch.optim.Adam(
        list(lstm.parameters()) + list(lin.parameters()), lr=1e-4,
        weight_decay=1e-3,
    )
    x = torch.randn(B, T, D)
    labels = torch.randint(0, 10, (B,))
    crit = torch.nn.CrossEntropyLoss()

    def step():
        opt.zero_grad()
        y, _ = lstm(x)
        loss = crit(lin(y[:, -1, :]), labels)
        loss.backward()
        opt.step()

    # one timed step, no warmup repeats: a single CPU step of this model
    # takes tens of minutes, and LSTM CPU time is allocation-stable
    # (cold == warm to within a few percent at these sizes)
    t0 = time.perf_counter()
    step()
    return time.perf_counter() - t0


def main():
    tpu_s = measure_tpu()
    print(json.dumps({"tpu_step_ms": round(tpu_s * 1e3, 1)}), flush=True)
    torch_s = measure_torch()
    res = {
        "B": B, "T": T, "D": D, "hidden": HID, "layers": LAYERS,
        "bidirectional": True,
        "tpu_step_ms": round(tpu_s * 1e3, 1),
        "tpu_samples_per_s": round(B / tpu_s),
        "torch_cpu_step_ms": round(torch_s * 1e3, 1),
        "speedup": round(torch_s / tpu_s, 1),
    }
    print(json.dumps(res), flush=True)
    results = json.load(open(OUT))
    results["classifier_bench"] = res
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
