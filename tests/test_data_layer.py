"""Data-layer tests: windows, NaN filtering, standardization, ingestion."""

import os

import numpy as np
import pytest

from multimodal_hand_pose_enhancement_for_sign_language_tpu.data import (
    io,
    openpose,
    standardize,
    synthetic,
    windows,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils.constants import (
    EPSILON,
    FEATURE_MAP,
)


def _clips(rng, lens=(5, 200, 192, 17), d=12):
    return [rng.randn(t, d).astype(np.float32) for t in lens]


def test_make_equal_len_cutting_reflect(rng):
    data = _clips(rng)
    res = windows.make_equal_len(data, method="cutting+reflect", maxpad=192)
    assert res.shape == (4, 192, 12)
    # long clips are cut
    np.testing.assert_array_equal(res[1], data[1][:192])
    np.testing.assert_array_equal(res[2], data[2])
    # short clips are reflect-padded (numpy 'reflect' golden)
    ref = np.pad(data[0], ((0, 187), (0, 0)), "reflect")
    np.testing.assert_array_equal(res[0], ref)


def test_make_equal_len_0pad_and_wrap(rng):
    data = _clips(rng, lens=(5, 9))
    res = windows.make_equal_len(data, method="0pad", maxpad=10)
    assert res.shape == (2, 10, 12)
    assert np.all(res[0, 5:] == 0)
    res = windows.make_equal_len(data, method="wrap", maxpad=4)
    assert res.shape == (2, 10, 12)  # max length 9 -> rounded up to 10
    res = windows.make_equal_len(data, method="cutting+0pad", maxpad=7)
    assert res.shape == (2, 7, 12)
    res = windows.make_equal_len(data, method="cutting")
    assert res.shape == (2, 4, 12)  # min 5 -> even 4


def test_rmv_clips_nan(rng):
    X = rng.randn(6, 4, 3)
    Y = rng.randn(6, 4, 2)
    T = rng.randn(6, 5)
    X[1, 0, 0] = np.nan
    Y[3, 2, 1] = np.nan
    T[5, 4] = np.nan
    X2, Y2, T2 = windows.rmv_clips_nan(X.copy(), Y.copy(), T.copy())
    assert X2.shape[0] == 3 and Y2.shape[0] == 3 and T2.shape[0] == 3
    assert not np.isnan(X2).any() and not np.isnan(Y2).any() and not np.isnan(T2).any()
    # single-nan-clip edge case (squeeze() returns a scalar)
    X = rng.randn(3, 2, 2)
    X[0, 0, 0] = np.nan
    X2, _, _ = windows.rmv_clips_nan(X)
    assert X2.shape[0] == 2


def test_mean_std_wh_vs_scalar_rule(rng):
    data = rng.randn(8, 6, 20).astype(np.float32)  # (N, D, T)
    mean, std = standardize.mean_std("wh", data, -6)
    assert mean.shape == (1, 6, 1) and std.shape == (1, 6, 1)
    np.testing.assert_allclose(
        mean[0, :, 0], data.mean(axis=2).mean(axis=0), rtol=1e-6
    )
    np.testing.assert_allclose(
        std[0, :, 0], data.std(axis=2).std(axis=0) + EPSILON, rtol=1e-6
    )
    mean2, std2 = standardize.mean_std("arm", data, -6)
    assert std2.shape == (1, 6, 1)
    np.testing.assert_allclose(std2[0, :, 0], data.std(), rtol=1e-6)


def test_calc_standard_shares_stats_when_in_eq_out(rng):
    X = rng.randn(4, 6, 10)
    Y = rng.randn(4, 6, 10)
    mx, sx, my, sy = standardize.calc_standard(X, Y, "wh2wh")
    np.testing.assert_array_equal(mx, my)
    np.testing.assert_array_equal(sx, sy)
    mx, sx, my, sy = standardize.calc_standard(X, Y, "arm2wh")
    assert not np.array_equal(mx, my)


@pytest.fixture(scope="module")
def r6d_dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("video_data")
    synthetic.make_r6d_dataset(str(d), n_clips=4, t_range=(50, 220), seed=3)
    return str(d)


def test_make_r6d_dataset_skips_image_feats(tmp_path):
    # regression: save_image_feats=False must actually skip the (T, 2000)
    # vid-feats pickles (at article scale they are ~35 GB of dead weight)
    d = str(tmp_path / "no_feats")
    synthetic.make_r6d_dataset(
        d, n_clips=3, t_range=(40, 60), seed=5,
        save_image_feats=False, ik_roundtrip=False,
    )
    produced = set(os.listdir(d))
    assert not any("vid_feats" in f for f in produced), produced
    # everything else in the processed-format contract is still written
    for stem in ("r6d", "xyz", "categs"):
        assert f"{stem}_train.pkl" in produced, produced
    assert "train_sentence_embeddings.pkl" in produced


def test_load_windows_pipelines(r6d_dataset):
    for pipeline in ("arm2wh", "arm_wh2wh", "wh2wh", "arm_wh2finger5"):
        p0_size, p1_size = FEATURE_MAP[pipeline]
        X, Y = windows.load_windows(
            os.path.join(r6d_dataset, "r6d_train.pkl"), pipeline
        )
        assert X.shape[1] == 192 and Y.shape[1] == 192
        assert Y.shape[2] == p1_size
        if pipeline in ("arm_wh2wh", "wh2wh"):
            assert X.shape[2] == 288  # full windows kept; Y sliced at 36
        else:
            assert X.shape[2] == p0_size


def test_load_windows_with_text_and_image(r6d_dataset):
    (X, text), Y = windows.load_windows(
        os.path.join(r6d_dataset, "r6d_train.pkl"),
        "arm2wh",
        require_text=True,
        text_path=os.path.join(r6d_dataset, "train_sentence_embeddings.pkl"),
    )
    assert text.shape == (4, 512)
    (X, img), Y = windows.load_windows(
        os.path.join(r6d_dataset, "r6d_train.pkl"),
        "arm2wh",
        require_image=True,
        image_path=os.path.join(r6d_dataset, "train_vid_feats.pkl"),
    )
    assert img.shape == (4, 192, 2000)


def test_load_windows_num_samples_cap_equivalence(tmp_path, rng):
    """The early num_samples cap must select exactly the windows the
    uncapped load + rmv_clips_nan + [:k] chain would consume."""
    d = str(tmp_path)
    n, k, dim = 12, 4, 288
    lens = [50, 210, 230, 192, 80, 250, 200, 60, 120, 240, 90, 195]
    clips = [rng.randn(t, dim).astype(np.float32) for t in lens]
    # NaNs: one inside the window, one beyond frame 192 (kept by the
    # window rule), one in a text row, one past-window in an image clip
    clips[1][3, 7] = np.nan
    clips[2][200:, :] = np.nan
    text = rng.randn(n, 16).astype(np.float32)
    text[4, 2] = np.nan
    imgs = [rng.randn(t, 8).astype(np.float32) for t in lens]
    # beyond the window: must NOT drop (in-window 3-D feats NaN is quirk
    # territory — reference rmv_clips_nan misindexes 3-D T; see its doc)
    imgs[5][195:, 0] = np.nan
    io.save_binary(clips, os.path.join(d, "r6d_train.pkl"))
    io.save_binary(text, os.path.join(d, "train_sentence_embeddings.pkl"))
    io.save_binary(imgs, os.path.join(d, "train_vid_feats.pkl"))

    path = os.path.join(d, "r6d_train.pkl")
    for kwargs in (
        {},
        {"require_text": True,
         "text_path": os.path.join(d, "train_sentence_embeddings.pkl")},
        {"require_image": True,
         "image_path": os.path.join(d, "train_vid_feats.pkl")},
    ):
        Xf, Yf = windows.load_windows(path, "arm2wh", **kwargs)
        Xc, Yc = windows.load_windows(path, "arm2wh", num_samples=k, **kwargs)
        feats_f = feats_c = None
        if kwargs:
            Xf, feats_f = Xf
            Xc, feats_c = Xc
            if isinstance(feats_f, list):
                feats_f = windows.make_equal_len(feats_f)
        Xf, Yf, feats_f = windows.rmv_clips_nan(Xf, Yf, feats_f)
        np.testing.assert_array_equal(Xc, Xf[:k])
        np.testing.assert_array_equal(Yc, Yf[:k])
        if kwargs:
            np.testing.assert_array_equal(
                np.asarray(feats_c), np.asarray(feats_f)[:k]
            )


def test_save_binary_append(tmp_path):
    p = str(tmp_path / "x.pkl")
    io.save_binary([1, 2], p)
    io.save_binary([3], p, append=True)
    assert io.load_binary(p) == [1, 2, 3]
    p2 = str(tmp_path / "e.pkl")
    io.save_binary(np.ones((2, 3)), p2)
    io.save_binary(np.zeros((1, 3)), p2, append="embeds")
    assert io.load_binary(p2).shape == (3, 3)


@pytest.fixture(scope="module")
def openpose_tree(tmp_path_factory):
    d = tmp_path_factory.mktemp("h2s_raw")
    return synthetic.make_openpose_tree(str(d), n_videos=2, utts_per_video=2, frames=5)


def test_load_utterance_and_grouping(openpose_tree):
    json_root = os.path.join(
        openpose_tree["dataset_path"],
        "train/rgb_front/features/openpose_output/json",
    )
    ids = sorted(os.listdir(json_root))
    assert len(ids) == 4
    in_kp, out_kp = openpose.load_utterance(os.path.join(json_root, ids[0]))
    assert in_kp.shape == (5, 75) and out_kp.shape == (5, 126)

    clips, ins, outs = openpose.load_utterances_parallel(ids, json_root, max_workers=2)
    g_clips, g_in, g_out = openpose.group_clips(clips, ins, outs)
    assert len(g_clips) == 2  # 2 videos
    assert g_in[0].shape == (10, 75)  # 2 utterances x 5 frames concatenated


def test_select_keypoints_and_hconcat(rng):
    from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils.constants import (
        ARMS,
        NECK,
    )

    kp = [rng.randn(4, 75)]
    neck = openpose.select_keypoints(kp, NECK)
    arms = openpose.select_keypoints(kp, ARMS)
    assert neck[0].shape == (4, 6) and arms[0].shape == (4, 18)
    np.testing.assert_array_equal(neck[0][:, 0:3], kp[0][:, 0:3])
    np.testing.assert_array_equal(arms[0][:, 0:3], kp[0][:, 6:9])
    # keep_confidence=False drops every third column
    arms_nc = openpose.select_keypoints(kp, ARMS, keep_confidence=False)
    assert arms_nc[0].shape == (4, 12)
    feats = openpose.hconcat_feats(neck, arms, [rng.randn(4, 126)])
    assert feats[0].shape == (4, 6 + 18 + 126)


def test_natural_keys_sorting():
    names = ["clip10", "clip2", "clip1"]
    assert sorted(names, key=openpose.natural_keys) == ["clip1", "clip2", "clip10"]
