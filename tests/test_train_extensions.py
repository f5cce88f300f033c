"""Trainer extensions: bf16 mixed precision, orbax checkpoints, effective
GAN gradient, schedulers, metrics sink, observability utilities."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_hand_pose_enhancement_for_sign_language_tpu.train import checkpoint as ckpt
from multimodal_hand_pose_enhancement_for_sign_language_tpu.train.gan import (
    GanConfig,
    GanTrainer,
    calc_motion,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.train.schedulers import (
    ReduceLROnPlateau,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils import (
    metrics as metrics_lib,
    nan_guard,
    profiling,
)

TINY = dict(feature_in_dim=12, feature_out_dim=24, default_size=32, window_t=32, batch_size=4)


def _batch(rng, cfg):
    x = jnp.asarray(rng.randn(4, cfg.window_t, cfg.feature_in_dim).astype(np.float32))
    y = jnp.asarray(rng.randn(4, cfg.window_t, cfg.feature_out_dim).astype(np.float32))
    return x, y


def test_calc_motion_reference_quirk(rng):
    """First frame minus each of the first T-1 frames, NOT adjacent deltas
    (train_gan.py:209-211)."""
    t = jnp.asarray(rng.randn(2, 5, 3).astype(np.float32))
    m = np.asarray(calc_motion(t))
    ref = np.asarray(t[:, :1, :] - t[:, :-1, :])
    np.testing.assert_array_equal(m, ref)
    assert m.shape == (2, 4, 3)


@pytest.mark.slow
def test_bf16_training_step(rng):
    cfg = GanConfig(compute_dtype="bfloat16", **TINY)
    tr = GanTrainer(cfg)
    state = tr.init_state()
    x, y = _batch(rng, cfg)
    state, g_loss = tr._g_step(state, x, y, None)
    state, d_loss = tr._d_step(state, x, y, None)
    assert np.isfinite(float(g_loss)) and np.isfinite(float(d_loss))
    # master params stay f32
    leaf = jax.tree_util.tree_leaves(state["g_params"])[0]
    assert leaf.dtype == jnp.float32
    # close to the f32 step (one step from identical init)
    tr32 = GanTrainer(GanConfig(**TINY))
    s32 = tr32.init_state()
    _, g32 = tr32._g_step(s32, x, y, None)
    assert abs(float(g_loss) - float(g32)) < 0.05 * max(abs(float(g32)), 1.0)


@pytest.mark.slow
def test_effective_gan_changes_gradients(rng):
    cfg_ref = GanConfig(**TINY)
    cfg_eff = GanConfig(effective_gan=True, **TINY)
    x, y = _batch(rng, cfg_ref)
    losses = {}
    for name, cfg in (("ref", cfg_ref), ("eff", cfg_eff)):
        tr = GanTrainer(cfg)
        state = tr.init_state()
        for _ in range(3):
            state, loss = tr._g_step(state, x, y, None)
        losses[name] = float(loss)
    # with the detached score the adversarial term has zero gradient, so
    # three steps land at (slightly) different params under effective_gan
    assert losses["ref"] != losses["eff"]


def test_rbg_prng_training_and_key_checkpoint_roundtrip(tmp_path, rng):
    """The trainer's dropout PRNG defaults to 'rbg' (TPU hardware RNG —
    measured ~2x faster train-mode forward, TPU_PROBE.json); the typed
    key must survive a pickle checkpoint round-trip via key-data
    serialization + ensure_key rewrap, and training must continue."""
    cfg = GanConfig(**TINY)
    tr = GanTrainer(cfg)
    state = tr.init_state()
    assert jax.dtypes.issubdtype(state["rng"].dtype, jax.dtypes.prng_key)
    x, y = _batch(rng, cfg)
    state, g_loss = tr._g_step(state, x, y, None)
    assert np.isfinite(float(g_loss))

    path = str(tmp_path / "ck.pkl")
    ckpt.save_checkpoint(path, {"epoch": 1, "state": state})
    loaded = ckpt.load_checkpoint(path)
    restored = loaded["state"]
    # tagged key data on disk (impl name serialized alongside the data,
    # so rbg vs unsafe_rbg is unambiguous); ensure_key rewraps exactly
    assert isinstance(restored["rng"], ckpt._KeyData)
    assert restored["rng"].impl == "rbg"
    restored["rng"] = ckpt.ensure_key(restored["rng"])
    restored = jax.tree.map(jnp.asarray, restored, is_leaf=lambda l: l is None)
    state2, g2 = tr._g_step(restored, x, y, None)
    assert np.isfinite(float(g2))

    # threefry option still available and continues from old-style
    # (legacy raw uint32) checkpoints
    legacy = np.asarray(jax.random.key_data(jax.random.key(0, impl="threefry2x32")))
    k = ckpt.ensure_key(legacy)
    assert jax.dtypes.issubdtype(k.dtype, jax.dtypes.prng_key)

    # tagged round-trip preserves impls the shape heuristic cannot
    # distinguish (unsafe_rbg shares rbg's (4,) data shape)
    unsafe = jax.random.key(7, impl="unsafe_rbg")
    tagged = ckpt._to_numpy({"k": unsafe})["k"]
    k2 = ckpt.ensure_key(tagged)
    assert str(jax.random.key_impl(k2)) == "unsafe_rbg"
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(k2)),
        np.asarray(jax.random.key_data(unsafe)),
    )

    # unrecognized raw data now fails loudly
    with pytest.raises(ValueError, match="unrecognized PRNG key data"):
        ckpt.ensure_key(np.zeros((3,), np.uint32))


def test_orbax_checkpoint_roundtrip(tmp_path, rng):
    payload = {
        "epoch": 3,
        "state": {"w": rng.randn(4, 4).astype(np.float32), "b": np.float32(1.5)},
    }
    path = str(tmp_path / "ck")
    ckpt.save_checkpoint(path, payload, backend="orbax")
    loaded = ckpt.load_checkpoint(path)
    np.testing.assert_array_equal(loaded["state"]["w"], payload["state"]["w"])
    assert int(loaded["epoch"]) == 3


def test_plateau_scheduler_reduces():
    s = ReduceLROnPlateau(1.0, patience=2, factor=0.5, min_lr=0.1)
    for v in (1.0, 1.0, 1.0, 1.0):
        lr = s.step(v)
    assert lr == 0.5
    for _ in range(3):
        lr = s.step(2.0)
    assert lr == pytest.approx(0.25)
    for _ in range(30):
        lr = s.step(2.0)
    assert lr == 0.1  # min_lr floor


def test_metrics_sink_jsonl(tmp_path):
    sink = metrics_lib.MetricsSink("t", out_dir=str(tmp_path))
    sink.log({"epoch": 0, "loss": 1.5})
    sink.close()
    lines = open(os.path.join(tmp_path, "metrics_t.jsonl")).read().strip().splitlines()
    assert len(lines) == 1 and '"loss": 1.5' in lines[0]


def test_nan_guard_and_grad_flow(rng):
    nan_guard.assert_finite("ok", np.ones(3))
    with pytest.raises(AssertionError):
        nan_guard.assert_finite("bad", np.array([1.0, np.nan]))
    tree = {"a": {"kernel": np.array([1.0, np.inf])}, "b": np.ones(2)}
    rep = nan_guard.tree_check_finite(tree)
    assert list(rep) == ["a/kernel"]

    from multimodal_hand_pose_enhancement_for_sign_language_tpu.viz import track_grads

    stats = track_grads.grad_flow_stats({"layer": {"kernel": np.ones((2, 2))}})
    assert stats["layer/kernel"]["ave"] == 1.0


def test_step_timer():
    t = profiling.StepTimer(warmup=0)
    for _ in range(3):
        t.tick()
    assert t.summary()["steps"] == 2


def test_stage_flattens_resident_datasets(rng):
    """Resident staging keeps datasets FLAT (N, T*D) on device — zero
    lane-tile padding and no in-program relayout copy at article scale
    (the round-4 config-2 HBM OOM).  run_epoch_resident must reshape
    batches back and still match the non-resident epoch bitwise."""
    cfg = GanConfig(**TINY)
    tr = GanTrainer(cfg)
    X = rng.randn(8, cfg.window_t, cfg.feature_in_dim).astype(np.float32)
    Y = rng.randn(8, cfg.window_t, cfg.feature_out_dim).astype(np.float32)
    dX, dY, dF = tr.stage(X, Y, None)
    assert dX.dev.ndim == 2 and dX.dev.shape == (8, cfg.window_t * cfg.feature_in_dim)
    assert dX.trail == (cfg.window_t, cfg.feature_in_dim)
    assert dY.dev.ndim == 2 and dF is None

    s1 = tr.init_state()
    s2 = tr.init_state()
    order = np.arange(8)
    s1, l_res = tr.run_epoch_resident(s1, dX, dY, dF, order, "g", 4)
    s2, l_pln = tr.run_epoch_scanned(s2, X, Y, None, "g", 4)
    np.testing.assert_allclose(l_res, l_pln, rtol=0, atol=1e-6)
    # legacy raw-array callers still work (as_staged wraps them)
    s3 = tr.init_state()
    s3, l_raw = tr.run_epoch_resident(
        s3, jnp.asarray(X), jnp.asarray(Y), None, order, "g", 4
    )
    np.testing.assert_allclose(l_raw, l_pln, rtol=0, atol=1e-6)
