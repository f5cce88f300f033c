"""OpenPose JSON ingestion and utterance/clip grouping.

Re-designs utils/utils.py:140-279: same on-disk format (per-frame OpenPose
BODY_25 + hand JSON files in one directory per utterance), same outputs
(lists of (T, 3*k) arrays carrying x, y, confidence triplets), but the
per-frame parsing is batched and the per-clip fan-out is a thread pool
(JSON parsing releases the GIL poorly, so a process pool remains optional;
the native C++ parser in runtime/ is used when built).
"""

from __future__ import annotations

import json
import os
import re
from concurrent.futures import ProcessPoolExecutor

import numpy as np


def natural_keys(text: str):
    """Natural sort key (reference proc_text.py:18-25)."""

    def atof(t):
        try:
            return float(t)
        except ValueError:
            return t

    return [atof(c) for c in re.split(r"[+-]?([0-9]+(?:[.][0-9]*)?|[.][0-9]+)", text)]


def retrieve_coords(keypoints):
    """Keep [x, y, w] triplets as a flat list (utils/utils.py:142-148)."""
    coords = []
    for i in range(0, len(keypoints), 3):
        coords.append(keypoints[i])
        coords.append(keypoints[i + 1])
        coords.append(keypoints[i + 2])
    return coords


def parse_frame_json(data: dict) -> tuple[np.ndarray, np.ndarray]:
    """One OpenPose frame dict -> (body_25 kp (75,), hands kp (126,))."""
    person = data["people"][0]
    in_kp = np.asarray(person["pose_keypoints_2d"], dtype=np.float64)
    out_kp = np.concatenate(
        [
            np.asarray(person["hand_right_keypoints_2d"], dtype=np.float64),
            np.asarray(person["hand_left_keypoints_2d"], dtype=np.float64),
        ]
    )
    return in_kp, out_kp


def load_utterance(clip_path: str, pipeline: str = "arm2wh", use_native=None):
    """Read all frame JSONs of one utterance directory.

    Returns (in_kp (T, 75), out_kp (T, 126)) like utils/utils.py:151-170;
    body 25 keypoints as input stream, right+left hand 21+21 as output.

    Uses the C++ scanner (runtime/openpose_parser.cpp) when built — the
    host-side ingestion hot path — with the Python json fallback.
    """
    from multimodal_hand_pose_enhancement_for_sign_language_tpu.runtime import (
        native,
    )

    if use_native is None:
        use_native = native.native_available()

    in_rows, out_rows = [], []
    for frame in sorted(os.listdir(clip_path)):
        path = os.path.join(clip_path, frame)
        if not os.path.isfile(path):
            continue
        if use_native:
            with open(path, "rb") as f:
                parsed = native.parse_openpose_frame_bytes(f.read())
            if parsed is not None:
                in_rows.append(parsed[0])
                out_rows.append(parsed[1])
                continue
            use_native = False  # library vanished mid-run: fall back
        with open(path) as f:
            data = json.load(f)
        i, o = parse_frame_json(data)
        in_rows.append(i)
        out_rows.append(o)
    if not in_rows:
        return np.zeros((0, 75)), np.zeros((0, 126))
    return np.stack(in_rows), np.stack(out_rows)


def _load(args):
    clip, directory, pipeline = args
    in_kp, out_kp = load_utterance(os.path.join(directory, clip), pipeline)
    return clip, in_kp, out_kp


def load_utterances_parallel(ids, directory, pipeline="arm2wh", max_workers=None):
    """Parallel fan-out over utterances (replaces ProcessPoolExecutor use
    at utils/utils.py:248-249).

    Uses a spawn multiprocessing context: forking a JAX-initialized
    (multithreaded) process can deadlock, and ingestion often runs after
    jax import."""
    import multiprocessing as mp

    with ProcessPoolExecutor(
        max_workers=max_workers, mp_context=mp.get_context("spawn")
    ) as ex:
        result = ex.map(_load, [(c, directory, pipeline) for c in ids])
    clips, in_features, out_features = map(list, zip(*result))
    return clips, in_features, out_features


def group_clips(clips, in_features, out_features):
    """Group utterance sequences into video clips by 11-char video id.

    Reference: utils/utils.py:173-202 (_groupClips) — natural-sorted
    concatenation per video id, outputs sorted by clip id.
    """
    assert len(clips) == len(in_features) == len(out_features)
    temp = sorted(
        zip(clips, in_features, out_features), key=lambda x: natural_keys(x[0])
    )
    clips_sorted = [t[0] for t in temp]
    in_sorted = [t[1] for t in temp]
    out_sorted = [t[2] for t in temp]

    clips_grouped = []
    in_grouped: dict = {}
    out_grouped: dict = {}
    for cid, i_feat, o_feat in zip(clips_sorted, in_sorted, out_sorted):
        clip_id = cid[:11]
        if clip_id not in in_grouped:
            clips_grouped.append(clip_id)
            in_grouped[clip_id] = i_feat
            out_grouped[clip_id] = o_feat
        else:
            in_grouped[clip_id] = np.concatenate((in_grouped[clip_id], i_feat), axis=0)
            out_grouped[clip_id] = np.concatenate((out_grouped[clip_id], o_feat), axis=0)

    clips_grouped = sorted(clips_grouped)
    in_features_grouped = [v for _, v in sorted(in_grouped.items())]
    out_features_grouped = [v for _, v in sorted(out_grouped.items())]
    return clips_grouped, in_features_grouped, out_features_grouped


# camelCase alias matching the reference symbol
_groupClips = group_clips


def get_joints(kp, idx):
    """Reference: utils/utils.py:360-361."""
    return kp[:, idx]


def select_keypoints(kp, idxs, keep_confidence=True):
    """Select joints by index from each clip of a list.

    Reference: utils/utils.py:365-375; vectorized gather instead of
    per-index hstack loops.
    """
    step = 3 if keep_confidence else 2
    cols = np.concatenate([np.arange(i * 3, i * 3 + step) for i in idxs])
    return [np.asarray(c)[:, cols] for c in kp]


def hconcat_feats(neck, arms, hands):
    """Reference: utils/utils.py:378-384."""
    assert [len(neck), len(arms)] == [len(hands), len(hands)]
    return [
        np.hstack((np.hstack((n, a)), h)) for n, a, h in zip(neck, arms, hands)
    ]
