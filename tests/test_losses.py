"""Loss parity: basic losses vs torch, robust loss vs the reference torch
implementation (oracle at /root/reference/utils/robust_loss) and vs the
reference's own partition-spline resource."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_UTILS = "/root/reference/utils"
if not os.path.isdir(REF_UTILS):
    pytest.skip("reference repo not mounted", allow_module_level=True)
sys.path.append(REF_UTILS)

# the oracle's distribution.py uses the long-removed pkg_resources API;
# shim just resource_stream so it can load its spline resource.
if "pkg_resources" not in sys.modules:
    import importlib
    import types

    def _resource_stream(package, resource):
        mod = importlib.import_module(package)
        return open(os.path.join(os.path.dirname(mod.__file__), resource), "rb")

    shim = types.ModuleType("pkg_resources")
    shim.resource_stream = _resource_stream
    sys.modules["pkg_resources"] = shim

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodal_hand_pose_enhancement_for_sign_language_tpu import losses  # noqa: E402
from multimodal_hand_pose_enhancement_for_sign_language_tpu.losses import robust  # noqa: E402
from multimodal_hand_pose_enhancement_for_sign_language_tpu.losses.robust import (  # noqa: E402
    distribution as dist_mod,
)


def test_basic_losses_match_torch(rng):
    p = rng.randn(8, 5).astype(np.float32)
    t = rng.randn(8, 5).astype(np.float32)
    tp, tt = torch.from_numpy(p), torch.from_numpy(t)
    np.testing.assert_allclose(
        float(losses.l1_loss(p, t)), torch.nn.L1Loss()(tp, tt).item(), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(losses.l2_loss(p, t)), torch.nn.MSELoss()(tp, tt).item(), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(losses.huber_loss(p, t, 1.0)),
        torch.nn.HuberLoss(delta=1.0)(tp, tt).item(),
        rtol=1e-6,
    )


def test_general_lossfun_matches_reference(rng):
    from robust_loss import general as ref_general

    x = rng.randn(6, 7).astype(np.float32) * 3
    for alpha in [-np.inf, -2.0, 0.0, 0.5, 1.0, 2.0, 2.5, 4.0, np.inf]:
        for scale in [0.5, 1.0, 2.0]:
            ours = np.asarray(
                robust.lossfun(x, jnp.float32(alpha), jnp.float32(scale))
            )
            ref = ref_general.lossfun(
                torch.from_numpy(x),
                torch.tensor(alpha, dtype=torch.float32),
                torch.tensor(scale, dtype=torch.float32),
            ).numpy()
            np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6, err_msg=f"alpha={alpha}")


def test_log_partition_matches_reference_spline():
    """Our quadrature-fitted spline must agree with the reference's fitted
    resource across the useful alpha range."""
    ref = np.load("/root/reference/utils/robust_loss/resources/partition_spline.npz")
    import torch as _t

    from robust_loss import cubic_spline as ref_spline
    from robust_loss import distribution as ref_dist

    alphas = np.concatenate(
        [np.linspace(0, 4, 41), np.array([5.0, 8.0, 16.0, 100.0])]
    ).astype(np.float32)
    x = ref_dist.partition_spline_curve(_t.from_numpy(alphas))
    ref_vals = ref_spline.interpolate1d(
        x * _t.tensor(float(ref["x_scale"])),
        _t.tensor(ref["values"], dtype=_t.float32),
        _t.tensor(ref["tangents"], dtype=_t.float32),
    ).numpy()

    ours = np.asarray(
        dist_mod.Distribution().log_base_partition_function(jnp.asarray(alphas))
    )
    np.testing.assert_allclose(ours, ref_vals, atol=2e-4)


def test_partition_curve_roundtrip():
    alphas = jnp.asarray(np.linspace(0, 20, 50, dtype=np.float32))
    x = dist_mod.partition_spline_curve(alphas)
    back = dist_mod.inv_partition_spline_curve(x)
    np.testing.assert_allclose(np.asarray(back), np.asarray(alphas), rtol=1e-4, atol=1e-4)


def test_nllfun_matches_reference(rng):
    from robust_loss import distribution as ref_dist

    x = (rng.randn(5, 4) * 2).astype(np.float32)
    alpha = np.asarray([[1.0, 1.5, 2.0, 3.0]], dtype=np.float32)
    scale = np.asarray([[0.5, 1.0, 2.0, 0.7]], dtype=np.float32)
    ours = np.asarray(
        dist_mod.Distribution().nllfun(x, jnp.asarray(alpha), jnp.asarray(scale))
    )
    ref = (
        ref_dist.Distribution()
        .nllfun(torch.from_numpy(x), torch.from_numpy(alpha), torch.from_numpy(scale))
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, atol=3e-4)


def test_adaptive_initial_state_matches_reference_config(rng):
    """At init the adaptive loss is the alpha=2, c=0.5 NLL — the effective
    training loss given the reference's never-optimized latents."""
    adaptive = robust.AdaptiveLossFunction(num_dims=6)
    params = adaptive.init()
    np.testing.assert_allclose(np.asarray(adaptive.alpha(params)), 2.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(adaptive.scale(params)), 0.5, rtol=1e-6)
    x = rng.randn(4, 6).astype(np.float32)
    ours = np.asarray(adaptive.lossfun(x, params))
    expected = np.asarray(
        dist_mod.Distribution().nllfun(x, jnp.float32(2.0), jnp.float32(0.5))
    )
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


def test_adaptive_latents_are_differentiable(rng):
    adaptive = robust.AdaptiveLossFunction(num_dims=3)
    params = adaptive.init()
    x = jnp.asarray(rng.randn(8, 3).astype(np.float32))
    g = jax.grad(lambda p: jnp.mean(adaptive.lossfun(x, p)))(params)
    assert float(jnp.abs(g["latent_alpha"]).sum()) > 0
    assert float(jnp.abs(g["latent_scale"]).sum()) > 0


def test_draw_samples_statistics():
    d = dist_mod.Distribution()
    alpha = jnp.full((4000,), 2.0)
    scale = jnp.full((4000,), 1.0)
    s = np.asarray(d.draw_samples(jax.random.PRNGKey(0), alpha, scale))
    # alpha=2 is a unit normal
    assert abs(s.mean()) < 0.1
    assert abs(s.std() - 1.0) < 0.1
