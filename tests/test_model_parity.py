"""Eval-mode forward parity of every generator variant + discriminator
against the reference PyTorch implementation (imported read-only from
/root/reference as a golden oracle), via the torch checkpoint porter."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if not os.path.isdir(REF):  # reference unavailable: skip the oracle tests
    pytest.skip("reference repo not mounted", allow_module_level=True)
sys.path.append(REF)
import modelZoo as ref_zoo  # noqa: E402

import jax  # noqa: E402

from multimodal_hand_pose_enhancement_for_sign_language_tpu.models import (  # noqa: E402
    registry,
    torch_port,
)

B, T, DS = 3, 32, 32
IN_DIM, OUT_DIM = 12, 8


def _randomize_running_stats(model, rng):
    """Make BN running stats non-trivial so eval parity actually tests them."""
    sd = model.state_dict()
    for k, v in sd.items():
        if k.endswith("running_mean"):
            sd[k] = torch.tensor(rng.randn(*v.shape).astype(np.float32) * 0.1)
        elif k.endswith("running_var"):
            sd[k] = torch.tensor(
                (1.0 + 0.1 * rng.rand(*v.shape)).astype(np.float32)
            )
    model.load_state_dict(sd)
    return model


def _port_and_compare(ref_model, key, x_bdt, feats_np, is_b2h=False, atol=2e-4):
    ref_model.eval()
    with torch.no_grad():
        t_feats = None if feats_np is None else torch.from_numpy(feats_np)
        ref_out = ref_model(torch.from_numpy(x_bdt), feats_=t_feats).numpy()

    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    variables = torch_port.generator_from_torch_state(sd)
    module = registry.build_generator(
        key,
        IN_DIM,
        OUT_DIM,
        require_text=feats_np is not None and not is_b2h,
        require_image=is_b2h and feats_np is not None,
        default_size=DS,
    )
    ours = np.asarray(
        registry.apply_bdt(module, variables, x_bdt, feats=feats_np, train=False)
    )
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, atol=atol, rtol=1e-4)


@pytest.mark.parametrize(
    "key,cls,with_feats",
    [
        ("v1", "regressor_fcn_bn_32", False),
        ("v1", "regressor_fcn_bn_32", True),
        ("v2", "regressor_fcn_bn_32_v2", False),
        ("v2", "regressor_fcn_bn_32_v2", True),
        ("v4", "regressor_fcn_bn_32_v4", True),
        ("v4_deeper", "regressor_fcn_bn_32_v4_deeper", True),
    ],
)
def test_generator_parity(rng, key, cls, with_feats):
    torch.manual_seed(0)
    ref_model = getattr(ref_zoo, cls)()
    ref_model.build_net(IN_DIM, OUT_DIM, require_text=with_feats, default_size=DS)
    _randomize_running_stats(ref_model, rng)
    x = rng.randn(B, IN_DIM, T).astype(np.float32)
    feats = rng.randn(B, 512).astype(np.float32) if with_feats else None
    _port_and_compare(ref_model, key, x, feats)


def test_b2h_parity_with_image(rng):
    # b2h hard-codes a 256-channel encoder (modelZoo.py:31) so it is only
    # shape-consistent at default_size=256 — test at full width.
    torch.manual_seed(0)
    ref_model = ref_zoo.regressor_fcn_bn_32_b2h()
    ref_model.build_net(IN_DIM, OUT_DIM, require_image=True, default_size=256)
    _randomize_running_stats(ref_model, rng)
    ref_model.eval()
    x = rng.randn(B, IN_DIM, T).astype(np.float32)
    feats = rng.randn(B, T, 2000).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(x), feats_=torch.from_numpy(feats)).numpy()
    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    variables = torch_port.generator_from_torch_state(sd)
    module = registry.build_generator(
        "b2h", IN_DIM, OUT_DIM, require_image=True, default_size=256
    )
    ours = np.asarray(
        registry.apply_bdt(module, variables, x, feats=feats, train=False)
    )
    np.testing.assert_allclose(ours, ref_out, atol=2e-4, rtol=1e-4)


def test_discriminator_parity(rng):
    torch.manual_seed(0)
    ref_model = ref_zoo.regressor_fcn_bn_discriminator()
    ref_model.build_net(OUT_DIM)
    _randomize_running_stats(ref_model, rng)
    ref_model.eval()
    x = rng.randn(B, OUT_DIM, T - 1).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(x)).numpy()
    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    variables = torch_port.discriminator_from_torch_state(sd)
    module = registry.build_discriminator(OUT_DIM)
    ours = np.asarray(registry.apply_disc_bdt(module, variables, x, train=False))
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, atol=2e-4, rtol=1e-4)


def test_shapes_at_full_size(rng):
    """Window-scale shape check: (B, 36, 192) -> (B, 252, 192)."""
    module = registry.build_generator("v1", 36, 252)
    variables = registry.init_generator(module, jax.random.PRNGKey(0), batch=2)
    x = rng.randn(2, 36, 192).astype(np.float32)
    y = registry.apply_bdt(module, variables, x)
    assert y.shape == (2, 252, 192)


def test_gradient_parity_vs_torch_autograd(rng):
    """d L1(G(x), y) / d params in eval mode (running BN stats, no
    dropout): our conv/conv-transpose/BN backward must match torch
    autograd with ported weights."""
    torch.manual_seed(1)
    ref_model = ref_zoo.regressor_fcn_bn_32()
    ref_model.build_net(IN_DIM, OUT_DIM, require_text=False, default_size=DS)
    _randomize_running_stats(ref_model, rng)
    ref_model.eval()

    x = rng.randn(B, IN_DIM, T).astype(np.float32)
    y = rng.randn(B, OUT_DIM, T).astype(np.float32)

    tx = torch.from_numpy(x)
    ty = torch.from_numpy(y)
    out = ref_model(tx)
    loss = torch.nn.L1Loss()(out, ty)
    loss.backward()
    t_grads = {k: p.grad.numpy() for k, p in ref_model.named_parameters()}

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    variables = torch_port.generator_from_torch_state(sd)
    module = registry.build_generator("v1", IN_DIM, OUT_DIM, default_size=DS)

    import jax.numpy as jnp

    def loss_fn(params):
        yh = module.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.swapaxes(jnp.asarray(x), 1, 2),
            None,
            False,
        )
        return jnp.mean(jnp.abs(jnp.swapaxes(yh, 1, 2) - jnp.asarray(y)))

    grads = jax.grad(loss_fn)(variables["params"])

    checks = [
        ("encoder.1.weight", grads["encoder"]["Conv1d_0"]["kernel"], (2, 1, 0)),
        ("conv7.1.weight", grads["conv7"]["Conv1d_0"]["kernel"], (2, 1, 0)),
        ("decoder.5.weight", grads["decoder"]["ConvTranspose1d_0"]["kernel"], (2, 0, 1)),
        ("decoder.9.bias", grads["decoder"]["Conv1d_0"]["bias"], None),
        ("skip4.3.weight", grads["skip4"]["BatchNorm_0"]["scale"], None),
    ]
    for t_key, ours, perm in checks:
        ref_g = t_grads[t_key]
        ours_np = np.asarray(ours)
        if perm is not None:
            ref_g = np.transpose(ref_g, perm)
        np.testing.assert_allclose(
            ours_np, ref_g, atol=2e-5, rtol=1e-3, err_msg=t_key
        )


def test_convtranspose_evenodd_decomposition_matches_dilated(rng):
    """ConvTranspose1d's opt-in stride-2 even/odd sub-pixel path (a
    measured-and-rejected perf lever — see the `decompose` attribute)
    must equal the literal dilated form, and non-qualifying configs must
    fall back to it."""
    import jax.numpy as jnp

    from multimodal_hand_pose_enhancement_for_sign_language_tpu.models.layers import (
        ConvTranspose1d,
    )

    for k, s, p, op, Tin in [(7, 2, 3, 1, 96), (7, 2, 3, 1, 5), (4, 2, 1, 0, 8),
                             (3, 1, 1, 0, 8), (6, 2, 2, 0, 9), (5, 3, 2, 0, 7)]:
        m = ConvTranspose1d(6, k, stride=s, padding=p, output_padding=op,
                            decompose=True)
        x = jnp.asarray(rng.randn(2, Tin, 5).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x)
        y = np.asarray(m.apply(v, x))
        kern = v["params"]["kernel"][::-1, :, :]
        lo, hi = k - 1 - p, k - 1 - p + op
        y_ref = np.asarray(
            jax.lax.conv_general_dilated(
                x, kern, (1,), [(lo, hi)], lhs_dilation=(s,),
                dimension_numbers=("NWC", "WIO", "NWC"),
            )
            + v["params"]["bias"]
        )
        assert y.shape == y_ref.shape, (k, s, p, op, Tin)
        np.testing.assert_allclose(y, y_ref, atol=1e-5, err_msg=str((k, s, p, op)))


def test_matmul_precision_overrides(rng):
    """Per-layer precision overrides: longest-matching-key resolution, and
    the context is numerically inert on CPU (precision is a TPU MXU
    operating point; CPU convs are f32 regardless)."""
    import jax.numpy as jnp

    from multimodal_hand_pose_enhancement_for_sign_language_tpu.models import layers

    with layers.matmul_precision_overrides(
        {"Conv1d_0": "float32", "decoder/Conv1d_0": "tensorfloat32"}
    ):
        assert layers._resolve_precision(("conv5", "Conv1d_0")) == jax.lax.Precision.HIGHEST
        # longest key wins
        assert (
            layers._resolve_precision(("decoder", "Conv1d_0"))
            == jax.lax.Precision.HIGH
        )
        assert layers._resolve_precision(("decoder", "BatchNorm_0")) is None
        # whole-component matching: "Conv1d_0" must not match "Conv1d_01"
        assert layers._resolve_precision(("conv5", "Conv1d_01")) is None
    assert layers._resolve_precision(("conv5", "Conv1d_0")) is None  # restored

    # specificity ignores decorative slashes: '/Conv1d_0/' must not
    # outrank the more specific bare key 'decoder/Conv1d_0'
    with layers.matmul_precision_overrides(
        {"/Conv1d_0/": "float32", "decoder/Conv1d_0": "tensorfloat32"}
    ):
        assert (
            layers._resolve_precision(("decoder", "Conv1d_0"))
            == jax.lax.Precision.HIGH
        )
    # a longer key mapped to None shadows the shorter match (documented
    # exemption semantics)
    with layers.matmul_precision_overrides(
        {"decoder": "float32", "decoder/Conv1d_0": None}
    ):
        assert layers._resolve_precision(("decoder", "Conv1d_0")) is None
        assert (
            layers._resolve_precision(("decoder", "Conv1d_1"))
            == jax.lax.Precision.HIGHEST
        )

    module = registry.build_generator("v1", IN_DIM, OUT_DIM, default_size=DS)
    variables = registry.init_generator(module, jax.random.PRNGKey(0), batch=2, T=T)
    x = jnp.asarray(rng.randn(2, T, IN_DIM).astype(np.float32))
    y0 = module.apply(variables, x, None, False)
    with layers.matmul_precision_overrides({"Conv1d_0": "tensorfloat32"}):
        y1 = module.apply(variables, x, None, False)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))


def _randomize_variables(variables, rng):
    """Fresh random leaves (BN var kept positive) so the export parity
    check is non-trivial — init-state BN stats are all-zero/one."""
    from jax.tree_util import tree_map_with_path

    def f(path, leaf):
        if getattr(path[-1], "key", "") == "var":
            return (1.0 + 0.1 * rng.rand(*leaf.shape)).astype(np.float32)
        return (rng.randn(*leaf.shape) * 0.1).astype(np.float32)

    return tree_map_with_path(f, variables)


def _assert_trees_bitwise(a, b):
    fa = {str(p): np.asarray(l)
          for p, l in jax.tree_util.tree_leaves_with_path(a)}
    fb = {str(p): np.asarray(l)
          for p, l in jax.tree_util.tree_leaves_with_path(b)}
    assert set(fa) == set(fb)
    for p in fa:
        np.testing.assert_array_equal(fa[p], fb[p], err_msg=p)


@pytest.mark.parametrize(
    "key,cls,with_feats",
    [("v1", "regressor_fcn_bn_32", False),
     ("v2", "regressor_fcn_bn_32_v2", True)],
)
def test_reverse_checkpoint_export(rng, key, cls, with_feats, tmp_path):
    """Checkpoint interchange in the EXPORT direction (VERDICT r4 #8):
    a generator trained HERE must load into the reference's own torch
    model via strict load_state_dict (inference.py:34-44) and produce
    the same eval output; import(export(v)) must round-trip bitwise."""
    module = registry.build_generator(
        key, IN_DIM, OUT_DIM, require_text=with_feats, default_size=DS
    )
    variables = _randomize_variables(
        registry.init_generator(module, jax.random.PRNGKey(0), batch=2, T=T),
        rng,
    )

    sd = torch_port.generator_to_torch_state(variables)
    # bitwise round-trip through the existing importer
    _assert_trees_bitwise(variables, torch_port.generator_from_torch_state(sd))

    # the reference's serving path consumes it unchanged (strict=True)
    torch.manual_seed(0)
    ref_model = getattr(ref_zoo, cls)()
    ref_model.build_net(IN_DIM, OUT_DIM, require_text=with_feats,
                        default_size=DS)
    ref_model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    )
    ref_model.eval()
    x = rng.randn(B, IN_DIM, T).astype(np.float32)
    feats = rng.randn(B, 512).astype(np.float32) if with_feats else None
    with torch.no_grad():
        t_feats = None if feats is None else torch.from_numpy(feats)
        ref_out = ref_model(torch.from_numpy(x), feats_=t_feats).numpy()
    ours = np.asarray(
        registry.apply_bdt(module, variables, x, feats=feats, train=False)
    )
    np.testing.assert_allclose(ours, ref_out, atol=2e-4, rtol=1e-4)

    # and the CLI --reverse path writes a .pth torch.load round-trips
    if key == "v1":
        import port_torch_checkpoint
        from multimodal_hand_pose_enhancement_for_sign_language_tpu.train import (
            checkpoint as ckpt_lib,
        )

        pkl = str(tmp_path / "ck.pkl")
        pth = str(tmp_path / "ck.pth")
        ckpt_lib.save_checkpoint(pkl, {
            "epoch": 7,
            "state": {"g_params": variables["params"],
                      "g_stats": variables["batch_stats"]},
        })
        ns = port_torch_checkpoint.argparse.Namespace(
            input=pkl, output=pth, discriminator="", reverse=True
        )
        port_torch_checkpoint.main(ns)
        loaded = torch.load(pth, map_location="cpu", weights_only=False)
        assert loaded["epoch"] == 7
        ref_model.load_state_dict(loaded["state_dict"])


def test_reverse_discriminator_export(rng):
    """Discriminator export direction: strict torch load + eval parity."""
    module = registry.build_discriminator(OUT_DIM)
    v = module.init(
        {"params": jax.random.PRNGKey(0)},
        np.zeros((2, T - 1, OUT_DIM), np.float32), False,
    )
    variables = _randomize_variables(v, rng)
    sd = torch_port.discriminator_to_torch_state(variables)
    _assert_trees_bitwise(variables,
                          torch_port.discriminator_from_torch_state(sd))
    torch.manual_seed(0)
    ref_model = ref_zoo.regressor_fcn_bn_discriminator()
    ref_model.build_net(OUT_DIM)
    ref_model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    )
    ref_model.eval()
    x = rng.randn(B, OUT_DIM, T - 1).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(x)).numpy()
    ours = np.asarray(registry.apply_disc_bdt(module, variables, x, train=False))
    np.testing.assert_allclose(ours, ref_out, atol=2e-4, rtol=1e-4)


def test_train_mode_updates_batch_stats(rng):
    module = registry.build_generator("v1", IN_DIM, OUT_DIM, default_size=DS)
    variables = registry.init_generator(module, jax.random.PRNGKey(0), batch=B, T=T)
    x = rng.randn(B, IN_DIM, T).astype(np.float32)
    y, new_stats = registry.apply_bdt(
        module, variables, x, train=True, dropout_rng=jax.random.PRNGKey(1)
    )
    old = variables["batch_stats"]["encoder"]["BatchNorm_0"]["mean"]
    new = new_stats["encoder"]["BatchNorm_0"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))
