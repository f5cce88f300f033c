"""Result-row <-> original-clip alignment (ADVICE r3 medium findings).

Inference persists sel_indices_{split}.pkl so downstream consumers
(the replay's classifier stages) can subset per-clip metadata (category
labels) to exactly the windows that made it into the results pickles —
the num_samples cap and NaN drops otherwise misalign every subsequent
label.  Also covers the lifting checkpoint writer's exception
propagation (a failed background write must abort loudly, not print a
traceback and resume from a stale prefix).
"""

import os
import pickle

import numpy as np
import pytest

from multimodal_hand_pose_enhancement_for_sign_language_tpu.data import (
    windows as win_lib,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.data.io import (
    save_binary,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.lifting.engine import (
    _CheckpointWriter,
)


def _clips(n, seed=0, nan_at=()):
    rng = np.random.RandomState(seed)
    clips = [rng.randn(60 + i, 288).astype(np.float32) for i in range(n)]
    for i in nan_at:
        clips[i][4, 7] = np.nan
    return clips


def test_load_windows_return_indices_cap_and_nan(tmp_path):
    clips = _clips(8, nan_at=(1, 3))
    p = str(tmp_path / "r6d_test.pkl")
    save_binary(clips, p)
    (x, y, idx) = win_lib.load_windows(
        p, "arm2wh", num_samples=4, return_indices=True
    )
    # the first 4 NaN-surviving clips are 0, 2, 4, 5
    assert idx == [0, 2, 4, 5]
    assert x.shape[0] == 4
    # uncapped: indices cover every clip, NaN drop happens downstream
    (x2, y2, idx2) = win_lib.load_windows(p, "arm2wh", return_indices=True)
    assert idx2 == list(range(8))
    dropped = win_lib.nan_clip_indices(x2, y2)
    assert dropped == [1, 3]
    kept = np.delete(np.asarray(idx2), dropped)
    assert kept.tolist() == [0, 2, 4, 5, 6, 7]


def test_selection_indices_reconstruction_matches_persisted(tmp_path):
    import article_replay

    clips = _clips(10, nan_at=(2,))
    data_dir = str(tmp_path / "video_data")
    res_dir = str(tmp_path / "results_cfg")
    os.makedirs(data_dir)
    os.makedirs(res_dir)
    save_binary(clips, os.path.join(data_dir, "r6d_train.pkl"))
    # results: first 5 valid windows (load_windows' selection rule)
    expected = [0, 1, 3, 4, 5]
    results = [clips[i][:52] for i in expected]
    save_binary(results, os.path.join(res_dir, "r6d_train.pkl"))
    # no sel file -> reconstructed
    got = article_replay._selection_indices(res_dir, data_dir, "train")
    assert got == expected
    # sel file present -> preferred verbatim
    save_binary([9, 8, 7], os.path.join(res_dir, "sel_indices_train.pkl"))
    assert article_replay._selection_indices(res_dir, data_dir, "train") == [
        9, 8, 7,
    ]


def test_classifier_stage_subsets_categs_and_gt(tmp_path):
    import article_replay

    clips = _clips(10)
    data_dir = str(tmp_path / "video_data")
    os.makedirs(data_dir)
    save_binary(clips, os.path.join(data_dir, "r6d_train.pkl"))
    save_binary(clips[:6], os.path.join(data_dir, "r6d_val.pkl"))
    save_binary(list(range(10)), os.path.join(data_dir, "categs_train.pkl"))
    save_binary(list(range(6)), os.path.join(data_dir, "categs_val.pkl"))
    sel = {"train": [0, 2, 5], "val": [1, 4]}
    gt_dir = str(tmp_path / "gt_subset")
    article_replay._build_gt_subset(data_dir, gt_dir, sel)
    with open(os.path.join(gt_dir, "r6d_train.pkl"), "rb") as f:
        gt_train = pickle.load(f)
    assert len(gt_train) == 3
    assert np.array_equal(gt_train[1], clips[2])


def test_checkpoint_writer_join_reraises(tmp_path):
    w = _CheckpointWriter([1, 2], str(tmp_path / "no_such_dir" / "x.pkl"))
    w.start()
    with pytest.raises(OSError):
        w.join()
    ok = _CheckpointWriter([1, 2], str(tmp_path / "ok.pkl"))
    ok.start()
    ok.join()
    assert os.path.exists(tmp_path / "ok.pkl")
