"""Dataset assembly drivers: the reference's load/process_H2S_dataset API.

Library equivalents of utils/utils.py:205-356 with paths as arguments
(the reference hard-codes cluster paths).  The CLI wrapper is
process_dataset.py at the repo root.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from multimodal_hand_pose_enhancement_for_sign_language_tpu.data import (
    categories as categ_lib,
    openpose,
    text as text_lib,
    video as video_lib,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.data.io import (
    load_binary,
    save_binary,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils.constants import (
    DATA_PATHS,
)


@dataclass
class DatasetPaths:
    """All external locations, overriding the reference's hard-coded
    cluster paths (proc_text.py:9-13, proc_vid.py:16-26, proc_categ.py:6-12)."""

    root: str
    text_template: str = "{split}.text.id.en"
    categ_template: str = "videoID_categoryID_{split}.csv"
    vid_template: str = "{split}/rgb_front/raw_videos"

    def json_dir(self, split):
        return os.path.join(self.root, DATA_PATHS[split])

    def text_path(self, split):
        p = self.text_template.format(split=split)
        return p if os.path.isabs(p) else os.path.join(self.root, p)

    def categ_path(self, split):
        p = self.categ_template.format(split=split)
        return p if os.path.isabs(p) else os.path.join(self.root, p)

    def vid_dir(self, split):
        p = self.vid_template.format(split=split)
        return p if os.path.isabs(p) else os.path.join(self.root, p)


def _join_ids(dir_list, clip_ids):
    """Reference utils/utils.py:205-206."""
    return list(set(dir_list).intersection(clip_ids))


def _load_h2s_split(
    paths: DatasetPaths,
    split: str,
    group_by_clip: bool = True,
    subset: float = 1.0,
    text_method: str = "precomputed",
    require_video_ids: bool = False,
    max_workers=None,
):
    """One split -> (in_features, out_features, embeds, categs).

    Reference _load_H2S_dataset (utils/utils.py:214-261): id intersection
    across keypoints/text(/video), parallel utterance load, text
    embeddings, utterance->video grouping.
    """
    json_dir = paths.json_dir(split)
    ids = sorted(os.listdir(json_dir))
    text_path = paths.text_path(split)
    if os.path.exists(text_path):
        ids = _join_ids(ids, text_lib.get_clip_ids(text_path))
    if require_video_ids and os.path.isdir(paths.vid_dir(split)):
        ids = _join_ids(ids, video_lib.get_vid_ids(paths.vid_dir(split)))
    ids = sorted(ids)
    idx_max = int(len(ids) * subset)
    ids = ids[:idx_max]

    categs = None
    categ_path = paths.categ_path(split)
    if os.path.exists(categ_path):
        id_categ = categ_lib.get_ids_categ(categ_path)
        if group_by_clip:
            categs = [v for _, v in sorted(id_categ.items())]
        else:
            categs = categ_lib.get_clips_categ(ids, id_categ)
        # reference returns categs[:idx_max] (utils/utils.py:262)
        categs = categs[:idx_max]

    clips, in_features, out_features = openpose.load_utterances_parallel(
        ids, json_dir, max_workers=max_workers
    )
    embeds = None
    if os.path.exists(text_path) and text_method != "precomputed":
        embeds = text_lib.obtain_embeddings(
            text_path, ids, method=text_method, groupByClip=group_by_clip
        )
    if group_by_clip:
        clips, in_features, out_features = openpose.group_clips(
            clips, in_features, out_features
        )
    return in_features, out_features, embeds, categs


def load_h2s_dataset(paths: DatasetPaths, subset: float = 0.1, **kwargs):
    """All three splits (reference load_H2S_dataset, utils/utils.py:263-279)."""
    out = {}
    for split in ("test", "val", "train"):
        if os.path.isdir(paths.json_dir(split)):
            out[split] = _load_h2s_split(paths, split, subset=subset, **kwargs)
    return out


# camelCase aliases for reference-API parity
load_H2S_dataset = load_h2s_dataset


def obtain_vid_crops(
    paths: DatasetPaths, split: str, data_dir: str, return_crops=False, chunk=500
):
    """Crop-extraction driver with chunked persistence
    (reference utils/utils.py:282-310)."""
    ids = sorted(
        _join_ids(
            os.listdir(paths.json_dir(split)),
            text_lib.get_clip_ids(paths.text_path(split)),
        )
    )
    vid_dir = paths.vid_dir(split)
    ids = sorted(_join_ids(ids, video_lib.get_vid_ids(vid_dir)))
    for start in range(0, len(ids), chunk):
        sub = ids[start : start + chunk]
        clips = [video_lib.load_clip(os.path.join(vid_dir, i + ".mp4")) for i in sub]
        crops = video_lib.obtain_cropped_clips(clips, paths.json_dir(split), sub)
        save_binary(crops, f"{data_dir}/{split}_vid_crops_{start}-{start + chunk}.pkl")
    files = glob.glob(f"{data_dir}/{split}_vid_crops_*.pkl")
    files.sort(key=openpose.natural_keys)  # chunk order, not lexicographic
    crops = []
    for f in files:
        crops += load_binary(f)
        os.remove(f)
    if return_crops:
        return crops
    save_binary(crops, f"{data_dir}/{split}_vid_crops.pkl")


def obtain_vid_feats(split: str, data_dir: str, hand_crops_list=None, weights_path=None):
    """Crops -> ResNet features pickle (reference utils/utils.py:314-319)."""
    if hand_crops_list is None:
        hand_crops_list = load_binary(f"{data_dir}/{split}_vid_crops.pkl")
    feats = video_lib.obtain_feats_crops_resnet(hand_crops_list, weights_path)
    save_binary(feats, f"{data_dir}/{split}_vid_feats.pkl")
    return feats


def obtain_vid_crops_and_feats(
    paths: DatasetPaths, split: str, data_dir: str, weights_path=None, chunk=500,
    return_feats=False,
):
    """Fused crops+features driver with chunked, naturally-sorted
    persistence (reference utils/utils.py:322-356)."""
    ids = sorted(
        _join_ids(
            os.listdir(paths.json_dir(split)),
            text_lib.get_clip_ids(paths.text_path(split)),
        )
    )
    vid_dir = paths.vid_dir(split)
    ids = sorted(_join_ids(ids, video_lib.get_vid_ids(vid_dir)))
    for start in range(0, len(ids), chunk):
        sub = ids[start : start + chunk]
        clips = [video_lib.load_clip(os.path.join(vid_dir, i + ".mp4")) for i in sub]
        crops = video_lib.obtain_cropped_clips(clips, paths.json_dir(split), sub)
        feats = video_lib.obtain_feats_crops_resnet(crops, weights_path)
        save_binary(feats, f"{data_dir}/{split}_vid_feats_{start}-{start + chunk}.pkl")
    files = glob.glob(f"{data_dir}/{split}_vid_feats_*.pkl")
    files.sort(key=openpose.natural_keys)
    feats = []
    for f in files:
        feats += load_binary(f)
    if return_feats:
        return feats
    save_binary(feats, f"{data_dir}/{split}_vid_feats.pkl")
