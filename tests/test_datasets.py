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
