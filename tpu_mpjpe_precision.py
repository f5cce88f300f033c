#!/usr/bin/env python
"""End-to-end MPJPE (vs the torch f32 reference, through the full
save_results geometry chain) for each XLA matmul-precision operating
point, traced INSIDE the precision context (the r2 run traced the
throughput programs outside it — fixed methodology, see
tpu_probe_forward.py docstring).

The decision this feeds: 'high' (bf16x3 passes, ~2x faster than
'highest') is the bench's operating precision iff it meets the 1e-3
MPJPE budget.  Appends to TPU_PROBE.json.

Run on the chip:  python tpu_mpjpe_precision.py
"""

import json
import sys

import numpy as np

from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils.platform import (
    ensure_platform_from_env,
)

ensure_platform_from_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

OUT = "TPU_PROBE.json"


def main():
    import torch

    sys.path.append("/root/reference")
    import modelZoo as ref_zoo

    from multimodal_hand_pose_enhancement_for_sign_language_tpu.models import (
        registry,
        torch_port,
    )
    from multimodal_hand_pose_enhancement_for_sign_language_tpu.ops import (
        kinematics,
        rotations,
        skeleton,
    )

    B, T, DIN, DOUT = 8, 192, 36, 252
    torch.manual_seed(0)
    m = ref_zoo.regressor_fcn_bn_32()
    m.build_net(DIN, DOUT, require_text=False)
    m.eval()
    rng = np.random.RandomState(0)
    x = (0.5 * rng.randn(B, DIN, T)).astype(np.float32)
    with torch.no_grad():
        ref_out = m(torch.from_numpy(x)).numpy()
    variables = torch_port.generator_from_torch_state(
        {k: v.numpy() for k, v in m.state_dict().items()}
    )
    module = registry.build_generator("v1", DIN, DOUT)
    xb = jnp.swapaxes(jnp.asarray(x), 1, 2)

    def fwd(precision):
        def apply(v, xb):
            with jax.default_matmul_precision(precision):
                return module.apply(v, xb, None, False)

        y = jax.jit(apply)(variables, xb)
        return np.asarray(jnp.swapaxes(y, 1, 2))

    structure = skeleton.get_skeletal_model_structure()
    root = np.zeros((6,), np.float32)
    root[4] = 1.0
    bone_len = rng.uniform(0.8, 1.2, size=(49,)).astype(np.float32)

    def to_xyz(hands_bdt):
        r6d = np.swapaxes(np.concatenate([x, hands_bdt], axis=1), 1, 2)
        aa = np.array(rotations.rot6d_to_aa(r6d))
        xyz = np.array(kinematics.aa_to_xyz(aa, root, bone_len, structure))
        return xyz.reshape(B, T, 50, 3)

    ref_xyz = to_xyz(ref_out)
    res = {"budget": 1e-3}
    for name in ("bfloat16", "tensorfloat32", "float32"):
        mpjpe = float(np.linalg.norm(to_xyz(fwd(name)) - ref_xyz, axis=-1).mean())
        res[f"mpjpe_{name}"] = mpjpe
        res[f"{name}_within_budget"] = bool(mpjpe <= 1e-3)

    try:
        results = json.load(open(OUT))
    except Exception:
        results = {}
    results["mpjpe_by_precision_traced_inside"] = res
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
