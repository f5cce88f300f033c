"""load_H2S_dataset library API on the synthetic raw tree."""

import os

import numpy as np
import pytest

from multimodal_hand_pose_enhancement_for_sign_language_tpu.data import (
    datasets,
    synthetic,
)


@pytest.fixture(scope="module")
def paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("h2s")
    synthetic.make_openpose_tree(str(d), n_videos=3, utts_per_video=2, frames=5)
    return datasets.DatasetPaths(root=str(d))


def test_split_loader_grouping_and_categs(paths):
    in_f, out_f, embeds, categs = datasets._load_h2s_split(
        paths, "train", group_by_clip=True, max_workers=2
    )
    assert len(in_f) == 3  # grouped into videos
    assert in_f[0].shape == (10, 75)  # 2 utterances x 5 frames
    assert out_f[0].shape == (10, 126)
    assert categs is not None and len(categs) == 3
    assert embeds is None  # precomputed method


def test_split_loader_subset_truncates_categs(paths):
    in_f, out_f, _, categs = datasets._load_h2s_split(
        paths, "train", group_by_clip=False, subset=0.5, max_workers=2
    )
    # 6 utterances * 0.5 = 3 kept; categs truncated to match (reference
    # utils/utils.py:262)
    assert len(in_f) == 3
    assert len(categs) == 3


def test_load_all_splits(paths):
    out = datasets.load_h2s_dataset(paths, subset=1.0, max_workers=2)
    assert set(out) == {"train", "val", "test"}
    # camelCase alias
    assert datasets.load_H2S_dataset is datasets.load_h2s_dataset


@pytest.mark.slow
def test_vid_crops_and_feats_drivers(tmp_path):
    """obtain_vid_crops / obtain_vid_crops_and_feats over synthetic mp4s
    (reference utils/utils.py:282-356), random-init flax ResNet."""
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    from multimodal_hand_pose_enhancement_for_sign_language_tpu.data.io import (
        load_binary,
    )

    root = str(tmp_path / "raw")
    synthetic.make_openpose_tree(root, n_videos=2, utts_per_video=1, frames=3)
    synthetic.make_video_tree(root)
    paths = datasets.DatasetPaths(root=root)
    out = str(tmp_path / "out")
    os.makedirs(out)

    crops = datasets.obtain_vid_crops(paths, "val", out, return_crops=True)
    assert len(crops) == 2
    assert crops[0].shape == (3, 3, 120, 120, 2)  # (T, C, H, W, hands)

    datasets.obtain_vid_crops_and_feats(paths, "val", out)
    feats = load_binary(os.path.join(out, "val_vid_feats.pkl"))
    assert len(feats) == 2
    assert feats[0].shape == (3, 2000)  # 1000 per hand
    assert np.isfinite(feats[0]).all()


@pytest.mark.slow
def test_process_dataset_cli_vid_feats(tmp_path):
    """The --vid_feats flag produces {split}_vid_feats.pkl end-to-end from
    one CLI call (the b2h data path, reference utils/utils.py:536-554)."""
    import subprocess
    import sys

    pytest.importorskip("cv2")
    root = str(tmp_path / "raw")
    synthetic.make_openpose_tree(root, n_videos=2, utts_per_video=1, frames=3)
    synthetic.make_video_tree(root)
    out = str(tmp_path / "out")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, os.path.join(repo, "process_dataset.py"),
         "--dataset_path", root, "--data_dir", out, "--vid_feats",
         "--no-group_by_clip", "--subset", "1.0"],
        capture_output=True, text=True, env=env, cwd=repo, timeout=900,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    from multimodal_hand_pose_enhancement_for_sign_language_tpu.data.io import (
        load_binary,
    )

    for split in ("train", "val", "test"):
        feats = load_binary(os.path.join(out, f"{split}_vid_feats.pkl"))
        assert len(feats) == 2 and feats[0].shape[1] == 2000
