"""The fused (preallocate-and-fill) training data path is BITWISE equal
to the legacy chain (make_equal_len -> slice -> rmv_clips_nan ->
swapaxes.astype stats -> expression standardize -> fancy-index shuffle).

The fused path exists because the legacy chain's transient copies are
~4x the dataset size, which thrashes overcommitted hosts at article
scale (STATUS.md round-3 diagnosis; VERDICT r3 next-round item 1).
Reference semantics under test: train_gan.py:129-205,
postprocess_utils.py:5-58, load_save_utils.py:37-58.
"""

import os
import pickle

import numpy as np
import pytest

from multimodal_hand_pose_enhancement_for_sign_language_tpu.data import (
    synthetic,
    windows as win_lib,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.train import (
    data as data_lib,
)


@pytest.fixture(scope="module")
def nan_fixture(tmp_path_factory):
    """Small r6d dataset with NaNs planted to exercise every drop rule:
    - clip 1: NaN in the ARM block inside the window (dropped by every
      pipeline EXCEPT wh2wh, whose NaN check runs after the [36:] slice),
    - clip 3: NaN in the hands block inside the window (always dropped),
    - clip 4: NaN beyond frame 192 (cut away BEFORE the check -> kept),
    - text-embeds row 5: NaN (dropped only when require_text).
    """
    d = str(tmp_path_factory.mktemp("fused") / "video_data")
    synthetic.make_r6d_dataset(
        d, n_clips=12, t_range=(50, 230), seed=11,
        save_image_feats=False, ik_roundtrip=False,
    )
    for split in ("train", "val"):
        p = os.path.join(d, f"r6d_{split}.pkl")
        with open(p, "rb") as f:
            clips = pickle.load(f)
        clips = [np.array(c, np.float32) for c in clips]  # force writable
        clips[1][5, 2] = np.nan              # arm block, in-window
        clips[3][10, 100] = np.nan           # hands block, in-window
        long_i = max(range(len(clips)), key=lambda i: clips[i].shape[0])
        if clips[long_i].shape[0] > 200:
            clips[long_i][200, 50] = np.nan  # beyond the 192 cut: kept
        with open(p, "wb") as f:
            pickle.dump(clips, f)
        ep = os.path.join(d, f"{split}_sentence_embeddings.pkl")
        with open(ep, "rb") as f:
            emb = pickle.load(f)
        emb = np.array(emb, np.float32)
        emb[5, 0] = np.nan
        with open(ep, "wb") as f:
            pickle.dump(emb, f)
    return d


@pytest.mark.parametrize("pipeline,require_text", [
    ("arm2wh", False),
    ("arm2wh", True),
    ("arm_wh2finger1", True),
    ("wh2wh", False),
    ("arm_wh2wh", False),
])
def test_fused_load_data_bitwise_equal(nan_fixture, tmp_path, pipeline,
                                       require_text):
    legacy = data_lib.load_data(
        nan_fixture, pipeline, str(tmp_path / "legacy"), "exp",
        np.random.RandomState(23456), require_text=require_text,
        assemble="legacy",
    )
    fused = data_lib.load_data(
        nan_fixture, pipeline, str(tmp_path / "fused"), "exp",
        np.random.RandomState(23456), require_text=require_text,
        assemble="fused",
    )
    for key in ("train_X", "train_Y", "val_X", "val_Y"):
        assert legacy[key].dtype == fused[key].dtype == np.float32
        assert np.array_equal(legacy[key], fused[key]), key
        assert legacy[key].shape[0] > 0
    if require_text:
        assert np.array_equal(legacy["train_feats"], fused["train_feats"])
        assert np.array_equal(legacy["val_feats"], fused["val_feats"])
    else:
        assert fused["train_feats"] is None
    for a, b in zip(legacy["stats"], fused["stats"]):
        assert np.array_equal(a, b)
    # the persisted stats npz files are identical too
    fn = f"exp{pipeline}_preprocess_core.npz"
    la = np.load(str(tmp_path / "legacy" / fn))
    fu = np.load(str(tmp_path / "fused" / fn))
    for k in la.files:
        assert np.array_equal(la[k], fu[k]), k


def test_fused_drop_rules(nan_fixture, tmp_path):
    """The planted NaNs produce exactly the expected keep counts."""
    kw = dict(model_path=str(tmp_path / "m"), exp_name="e",
              require_text=False)
    arm = data_lib.load_data(nan_fixture, "arm2wh", kw["model_path"], "e",
                             np.random.RandomState(0), assemble="fused")
    wh = data_lib.load_data(nan_fixture, "wh2wh", kw["model_path"], "e2",
                            np.random.RandomState(0), assemble="fused")
    # arm2wh checks all 288 cols -> clips 1 and 3 dropped (10 kept);
    # wh2wh checks cols 36: only -> clip 1's arm NaN survives (11 kept)
    assert arm["train_X"].shape[0] == 10
    assert wh["train_X"].shape[0] == 11
    txt = data_lib.load_data(nan_fixture, "arm2wh", kw["model_path"], "e3",
                             np.random.RandomState(0), require_text=True,
                             assemble="fused")
    assert txt["train_X"].shape[0] == 9  # embeds row 5 also dropped


def test_assemble_windows_matches_legacy_composition():
    rng = np.random.RandomState(4)
    clips = [
        np.asarray(rng.randn(t, 288), np.float32)
        for t in (30, 192, 250, 191, 2, 60)
    ]
    clips[0][3, 7] = np.nan
    clips[2][240, 0] = np.nan  # beyond cut
    feats = np.asarray(rng.randn(len(clips), 16), np.float32)
    feats[4, 3] = np.nan
    x_cols, y_cols = win_lib.pipeline_column_slices("arm2wh")

    w = win_lib.make_equal_len(clips, method="cutting+reflect")
    lx, ly, lf = win_lib.rmv_clips_nan(
        w[:, :, x_cols], w[:, :, y_cols], feats
    )
    fx, fy, ff, kept = win_lib.assemble_windows(
        clips, x_cols, y_cols, slice(None), feats=feats
    )
    assert np.array_equal(lx, fx) and np.array_equal(ly, fy)
    assert np.array_equal(lf, ff)
    assert kept == [1, 2, 3, 5]


def test_embeds_type_average_load_path(nan_fixture, tmp_path):
    """--embeds_type average consumes average_{split}_sentence_embeddings
    (proc_text.py:133-139): every surviving clip's feature row is the
    dataset column mean, and NaN drops track the r6d clips only (the
    averaged rows are NaN-free by construction)."""
    from multimodal_hand_pose_enhancement_for_sign_language_tpu.data import (
        text as text_lib,
    )
    from multimodal_hand_pose_enhancement_for_sign_language_tpu.data.io import (
        load_binary,
    )

    out = data_lib.load_data(
        nan_fixture, "arm_wh2finger1", str(tmp_path / "avg"), "e",
        np.random.RandomState(23456), require_text=True,
        embeds_type="average",
    )
    avg = np.asarray(
        load_binary(os.path.join(
            nan_fixture, "average_train_sentence_embeddings.pkl"
        ))
    )
    # r6d clips 1 and 3 carry NaNs -> 10 of 12 survive (the averaged
    # rows have no NaN, unlike the normal embeds whose row 5 does)
    assert out["train_feats"].shape == (10, avg.shape[1])
    assert np.allclose(out["train_feats"], avg[0])
    # the helper matches the reference's mean+tile contract
    e = np.random.RandomState(3).randn(7, 5).astype(np.float32)
    a = text_lib.average_embeds(e)
    assert a.shape == e.shape
    assert np.allclose(a, np.tile(np.average(e, axis=0), (7, 1)))


def test_permute_rows_inplace_equals_fancy_index():
    rng = np.random.RandomState(9)
    for n, shape in ((1, (3,)), (2, (4, 5)), (37, (6, 7)), (128, (2,))):
        a = rng.randn(n, *shape).astype(np.float32)
        order = np.arange(n)
        rng.shuffle(order)
        want = a[order]
        got = win_lib.permute_rows_inplace(a.copy(), order)
        assert np.array_equal(want, got)


def test_clips_cache_across_pipelines(nan_fixture, tmp_path, monkeypatch):
    """MHPE_LOAD_DATA_CACHE=1 (set by article_replay.py across its 7
    same-pickle config loads) loads each r6d pickle ONCE, returns results
    bitwise equal to the uncached path, and freezes the cached clips so a
    would-be mutation raises instead of corrupting a later config."""
    uncached = {
        pl: data_lib.load_data(
            nan_fixture, pl, str(tmp_path / f"u{pl}"), "exp",
            np.random.RandomState(23456), assemble="fused",
        )
        for pl in ("arm2wh", "arm_wh2finger1")
    }

    monkeypatch.setenv("MHPE_LOAD_DATA_CACHE", "1")
    monkeypatch.setattr(data_lib, "_CLIPS_CACHE", {})
    calls = []
    real_load = data_lib.load_binary
    monkeypatch.setattr(
        data_lib, "load_binary",
        lambda p: (calls.append(p), real_load(p))[1],
    )
    for pl in ("arm2wh", "arm_wh2finger1"):
        got = data_lib.load_data(
            nan_fixture, pl, str(tmp_path / f"c{pl}"), "exp",
            np.random.RandomState(23456), assemble="fused",
        )
        for key in ("train_X", "train_Y", "val_X", "val_Y"):
            assert np.array_equal(uncached[pl][key], got[key]), (pl, key)
    r6d_loads = [p for p in calls if "r6d_" in os.path.basename(p)]
    assert len(r6d_loads) == 2, r6d_loads  # train+val once, not per config
    (clips,) = [
        v for k, v in data_lib._CLIPS_CACHE.items() if "train" in k[0]
    ][:1] or [None]
    assert clips is not None
    with pytest.raises(ValueError):
        clips[0][0, 0] = 1.0  # frozen: read-only guard
    data_lib._CLIPS_CACHE.clear()
