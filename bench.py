#!/usr/bin/env python
"""Benchmark: enhancement throughput (frames/sec/chip) of the flagship
generator (v1, arm2wh, 192-frame windows) vs the PyTorch CPU reference.

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Methodology (corrected this round — see TPU_PROBE.json):
  * K forwards chained on-device inside one jitted program, with the
    FULL mean of each output folded into the carry — a y[:, :, :36]
    slice would let XLA dead-code-eliminate 86% of the final conv's
    output channels (r2 bug, inflated the number).
  * The matmul-precision context wraps the apply INSIDE the traced
    function: jit traces lazily at the first call, so a context around
    the jit definition binds nothing (r2 bug: the "float32-precision"
    bench actually measured DEFAULT 1-bf16-pass precision).
  * K is large enough that the ~31 ms axon-tunnel per-call overhead is
    <2% of a measurement; the torch baseline is timed around bare
    forward calls on in-memory tensors, so neither side pays dispatch.

Operating precision: 'tensorfloat32' (three bf16 MXU passes).  Measured
end-to-end MPJPE vs the torch f32 reference through the save_results
geometry chain: DEFAULT one-pass 5.4e-3 (FAILS the 1e-3 BASELINE
budget), tensorfloat32 ~1e-5 (passes), float32 six-pass 7.6e-7 (passes
at ~1.8x the cost).  tensorfloat32 is the cheapest budget-passing
point, and XLA runs it at ~87% of the 3-pass MXU roofline
(TPU_PROBE.json "whole_forward_tensorfloat32", "mpjpe_by_precision").
"""

import argparse
import json
import os
import sys
import time

import numpy as np

from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils.platform import (
    ensure_platform_from_env,
)

ensure_platform_from_env()

B = int(os.environ.get("MHPE_BENCH_B", 2048))  # per-chip batch (sweep-optimal)
B_CPU = 256  # torch CPU baseline batch (its throughput is batch-flat)
T = 192
K = int(os.environ.get("MHPE_BENCH_K", 64))
# median-of-REPS: the axon tunnel adds ~±15% run-to-run noise
REPS = int(os.environ.get("MHPE_BENCH_REPS", 7))
IN_DIM, OUT_DIM = 36, 252
PRECISION = "tensorfloat32"  # cheapest budget-passing point (see module doc)

# Pinned reference numbers, recorded alongside the live measurement so
# round-over-round deltas don't carry noise from BOTH ends:
# torch CPU reference v1 forward measured on this host (frames/sec) —
# also the fallback when /root/reference or torch is unavailable.
RECORDED_CPU_BASELINE = 31_000.0


def measure_tpu(n_devices: int = 1, max_attempts: int = None,
                spread_gate: float = None):
    """Median-of-REPS throughput (frames/sec/chip).  With n_devices > 1,
    the batch is DP-sharded over a ('data',) mesh — the weak-scaling
    measurement path for real multi-chip hardware (each chip gets the
    same per-chip batch B, so perfect scaling reports a flat
    frames/s/chip).  Returns (median, spread_fraction, attempts).

    Thrash defense (VERDICT r3: the round-3 official capture ran during
    a host-memory-thrash episode and recorded 5.6M fr/s with spread 3.7
    vs the same day's clean 22M at spread 0.01): a measurement set whose
    (max-min)/median spread exceeds ``spread_gate`` is re-measured up to
    ``max_attempts`` times (re-warmed each time), and the cleanest set
    (minimum spread) is reported together with the attempt count."""
    import jax
    import jax.numpy as jnp

    from multimodal_hand_pose_enhancement_for_sign_language_tpu.models import registry

    module = registry.build_generator("v1", IN_DIM, OUT_DIM)
    variables = registry.init_generator(module, jax.random.PRNGKey(0), batch=2, T=T)

    def many(v, x):
        def body(i, carry):
            with jax.default_matmul_precision(PRECISION):  # binds at trace
                y = module.apply(v, carry, None, False)
            # fold the FULL output back into the carry (elision-proof),
            # numerically inert at 1e-30 scale
            return carry + jnp.mean(y) * 1e-30

        return jax.lax.fori_loop(0, K, body, x).mean()

    b_total = B * n_devices
    x = jnp.asarray(
        np.random.RandomState(0).randn(b_total, T, IN_DIM).astype(np.float32)
    )
    if n_devices > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        if len(jax.devices()) < n_devices:
            raise RuntimeError(
                f"--devices {n_devices} but only {len(jax.devices())} visible"
            )
        mesh = Mesh(np.array(jax.devices()[:n_devices]), ("data",))
        x = jax.device_put(x, NamedSharding(mesh, P("data")))
        variables = jax.device_put(variables, NamedSharding(mesh, P()))
    if max_attempts is None:
        max_attempts = int(os.environ.get("MHPE_BENCH_ATTEMPTS", 4))
    if spread_gate is None:
        spread_gate = float(os.environ.get("MHPE_BENCH_SPREAD_GATE", 0.2))
    f = jax.jit(many)
    float(f(variables, x))  # compile + warm (scalar fetch syncs the tunnel)
    sets = []
    for attempt in range(max_attempts):
        if attempt:
            float(f(variables, x))  # re-warm after a dirty set
        times = []
        for _ in range(REPS):
            t0 = time.time()
            float(f(variables, x))
            times.append((time.time() - t0) / K)
        med = float(np.median(times))
        spread = float((max(times) - min(times)) / med)
        sets.append((spread, med))
        if spread <= spread_gate:
            break
    spread, med = min(sets)  # cleanest set
    return b_total * T / med / n_devices, spread, len(sets)


def tpu_reachable(timeout_s: int = 240, claim_grace_s: int = 600) -> bool:
    """Probe device availability in a SUBPROCESS with a hard timeout.

    With the axon tunnel down, the first jax.devices() blocks forever in
    the plugin's claim-retry loop — in-process there is no way to give
    up.  A bench that hangs produces NO artifact; a bench that reports
    the outage produces an honest one.  CPU-only configs skip the probe
    (nothing to claim).

    Killing discipline (tpu_chain_r4b.sh postmortem): a probe killed
    while still BLOCKED in the claim-retry loop is harmless, but a probe
    killed AFTER it claimed the terminal leaves a ~30 min stale
    server-side lease that makes every subsequent claimer block.  The
    child therefore drops a marker file the moment jax.devices()
    returns; the parent only applies ``timeout_s`` to the un-claimed
    phase, and once claimed grants ``claim_grace_s`` extra for the
    trivial scalar fetch before giving up."""
    import subprocess
    import tempfile

    platforms = os.environ.get("JAX_PLATFORMS", "axon,cpu")
    if "axon" not in platforms and "tpu" not in platforms:
        return True
    fd, marker = tempfile.mkstemp(prefix="mhpe_tpu_probe_")
    os.close(fd)
    code = (
        "import jax, numpy as np\n"
        "jax.devices()\n"
        f"open({marker!r}, 'w').write('claimed')\n"
        "print(float(np.asarray(jax.numpy.ones((8, 8)).sum())))\n"
    )
    p = subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    t0 = time.time()
    try:
        while True:
            rc = p.poll()
            if rc is not None:
                return rc == 0
            claimed = os.path.getsize(marker) > 0
            elapsed = time.time() - t0
            if not claimed and elapsed > timeout_s:
                p.kill()  # still blocked claiming: no lease held, safe
                p.wait()
                return False
            if claimed and elapsed > timeout_s + claim_grace_s:
                # holds the terminal but can't finish a trivial fetch:
                # unusable either way; killing costs the stale lease,
                # hanging costs the artifact — report the outage
                p.kill()
                p.wait()
                return False
            time.sleep(1.0)
    finally:
        try:
            os.unlink(marker)
        except OSError:
            pass


def measure_torch_baseline() -> float:
    try:
        import torch

        sys.path.append("/root/reference")
        import modelZoo  # noqa: F401

        m = modelZoo.regressor_fcn_bn_32()
        m.build_net(IN_DIM, OUT_DIM, require_text=False)
        m.eval()
        x = torch.randn(B_CPU, IN_DIM, T)
        with torch.no_grad():
            m(x)  # warm
            best = np.inf
            for _ in range(2):
                t0 = time.time()
                m(x)
                best = min(best, time.time() - t0)
        return B_CPU * T / best
    except Exception:
        return RECORDED_CPU_BASELINE


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--devices", type=int, default=1,
        help="DP-shard the batch over this many devices (weak scaling: "
        "per-chip batch stays B; reports frames/sec/chip).  Use with "
        "real multi-chip hardware, or virtual CPU devices via "
        "XLA_FLAGS=--xla_force_host_platform_device_count=N",
    )
    args = ap.parse_args(argv)

    if not tpu_reachable():
        # one parseable JSON line even when the device pool is gone
        print(
            json.dumps(
                {
                    "metric": "enhancement_throughput",
                    "value": 0.0,
                    "unit": "frames/sec/chip",
                    "vs_baseline": 0.0,
                    "error": "tpu unreachable (axon tunnel down); "
                    "see STATUS.md for the last clean measurement",
                    "baseline_recorded": RECORDED_CPU_BASELINE,
                    "devices": args.devices,
                }
            )
        )
        return

    frames_per_sec, spread, attempts = measure_tpu(args.devices)
    baseline_live = measure_torch_baseline()
    # a thrashing host can also corrupt the LIVE torch baseline (r3:
    # 788.9 fr/s vs the same host's pinned 31,000 — 40x low, which would
    # inflate vs_baseline 40x); when the live number is implausibly far
    # below the pinned record, the pinned one is the honest denominator
    baseline_degraded = baseline_live < 0.5 * RECORDED_CPU_BASELINE
    denom = RECORDED_CPU_BASELINE if baseline_degraded else baseline_live
    print(
        json.dumps(
            {
                "metric": "enhancement_throughput",
                "value": round(frames_per_sec, 1),
                "unit": "frames/sec/chip",
                "vs_baseline": round(frames_per_sec / denom, 2),
                # provenance: live vs pinned baseline + measurement noise,
                # so round-over-round deltas are interpretable
                "baseline_live": round(baseline_live, 1),
                "baseline_degraded": baseline_degraded,
                "baseline_recorded": RECORDED_CPU_BASELINE,
                "vs_baseline_recorded": round(
                    frames_per_sec / RECORDED_CPU_BASELINE, 2
                ),
                "reps": REPS,
                "spread": round(spread, 3),
                "attempts": attempts,
                "devices": args.devices,
            }
        )
    )


if __name__ == "__main__":
    main()
