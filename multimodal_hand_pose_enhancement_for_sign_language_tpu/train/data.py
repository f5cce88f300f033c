"""Training data assembly: the load_data path of train_gan.py:129-205.

Loads r6d windows (+ optional text/image features), drops NaN clips,
computes and persists standardization stats, standardizes, and shuffles
with the reference's RandomState(23456).

Layout note: the reference trains in (N, D, T); this framework's models
are NLC, so arrays are returned as (N, T, D) and the persisted
standardization npz keeps the reference's (1, D, 1) shape contract so
stats files remain interchangeable.
"""

from __future__ import annotations

import os

import numpy as np

from multimodal_hand_pose_enhancement_for_sign_language_tpu.data import (
    standardize as std_lib,
    windows as win_lib,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.data.io import (
    load_binary,
    mkdir,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils.constants import (
    DATA_PATHS_r6d,
)


def fetch_split(
    data_dir: str,
    split: str,
    pipeline: str,
    require_text=False,
    require_image=False,
    embeds_type: str = "normal",
    base_path: str = "./",
):
    """One split -> (X, Y, feats|None), reference fetch_data (:131-150)."""
    path = os.path.join(data_dir, DATA_PATHS_r6d[split])
    if embeds_type == "normal":
        text_path = f"{data_dir}/{split}_sentence_embeddings.pkl"
    else:  # "average"
        text_path = f"{data_dir}/average_{split}_sentence_embeddings.pkl"
    image_path = f"{data_dir}/{split}_vid_feats.pkl"
    data_path = os.path.join(base_path, path)
    p0, p1 = win_lib.load_windows(
        data_path,
        pipeline,
        require_text=require_text,
        text_path=text_path,
        require_image=require_image,
        image_path=image_path,
    )
    if require_text or require_image:
        feats = p0[1]
        p0 = p0[0]
        return p0, p1, feats
    return p0, p1, None


# Opt-in read-only cache of loaded r6d clip pickles, keyed by file
# identity.  The article-replay driver loads the SAME train/val pickles
# once per config (2 canonical + 5 finger-trend configs = 7 multi-GB
# pickle loads at article scale); on an overcommitted host where fresh
# page faults are the bottleneck (STATUS.md round-3 diagnosis) each
# redundant load costs minutes.  Enabled with MHPE_LOAD_DATA_CACHE=1
# (article_replay.py sets it); cached arrays are marked read-only so any
# would-be mutation raises instead of corrupting a later config's data.
_CLIPS_CACHE: dict = {}
_CLIPS_CACHE_MAX = 4  # train+val r6d pickles, with slack


def _load_clips_cached(path: str):
    if os.environ.get("MHPE_LOAD_DATA_CACHE") != "1":
        return load_binary(path)
    st = os.stat(path)
    key = (os.path.realpath(path), st.st_mtime_ns, st.st_size)
    if key not in _CLIPS_CACHE:
        data = load_binary(path)
        if isinstance(data, list) and all(
            isinstance(a, np.ndarray) for a in data
        ):
            for a in data:
                a.flags.writeable = False
        while len(_CLIPS_CACHE) >= _CLIPS_CACHE_MAX:
            _CLIPS_CACHE.pop(next(iter(_CLIPS_CACHE)))
        _CLIPS_CACHE[key] = data
    return _CLIPS_CACHE[key]


def _fetch_split_fused(
    data_dir, split, pipeline, require_text, embeds_type, base_path
):
    """Memory-light fetch_split: fused equalize+slice+NaN-drop.

    Bitwise-equal to fetch_split + the wh2wh slice + rmv_clips_nan (the
    equality is test-asserted, tests/test_load_fused.py) but its only
    large allocations are the final X/Y arrays — no list-of-padded-copies,
    no np.array re-materialization, no np.delete copies.  Returns None if
    the fused preconditions don't hold (per-frame image feats, or clips
    not float32) so load_data can fall back to the legacy path.
    """
    path = os.path.join(base_path, os.path.join(data_dir, DATA_PATHS_r6d[split]))
    if not os.path.exists(path):
        return None
    data = _load_clips_cached(path)
    if not all(
        isinstance(arr, np.ndarray) and arr.dtype == np.float32 for arr in data
    ):
        return None  # legacy path casts stats to f32 mid-chain; keep it
    feats = None
    if require_text:
        if embeds_type == "normal":
            text_path = f"{data_dir}/{split}_sentence_embeddings.pkl"
        else:  # "average"
            text_path = f"{data_dir}/average_{split}_sentence_embeddings.pkl"
        feats = load_binary(text_path)
    x_cols, y_cols = win_lib.pipeline_column_slices(pipeline)
    if pipeline == "wh2wh":
        # the legacy chain slices X to [36:] BEFORE the NaN check, so
        # NaNs confined to the arm block must NOT drop a clip
        x_cols = slice(6 * 6, None)
        check_cols = slice(6 * 6, None)
    else:
        width = data[0].shape[1] if data else 0
        covered = set(range(*x_cols.indices(width))) | set(
            range(*y_cols.indices(width))
        )
        assert covered == set(range(width)), (pipeline, x_cols, y_cols)
        check_cols = slice(None)
    X, Y, feats, _ = win_lib.assemble_windows(
        data, x_cols, y_cols, check_cols, feats=feats
    )
    return X, Y, feats


def load_data(
    data_dir: str,
    pipeline: str,
    model_path: str,
    exp_name: str,
    rng: np.random.RandomState,
    require_text=False,
    require_image=False,
    embeds_type="normal",
    base_path="./",
    assemble: str = "auto",
):
    """Reference load_data (:129-205) in NLC layout.

    Returns dict with train_X/train_Y/val_X/val_Y (+feats) as (N, T, D)
    float32, plus the standardization stats.

    ``assemble``: "auto" (default) uses the fused preallocate-and-fill
    path when possible (float32 clips, no per-frame image feats) and
    falls back to "legacy" otherwise.  The two are bitwise-equal
    (tests/test_load_fused.py); the fused path exists because the legacy
    chain's ~4x-dataset-size transient copies thrash overcommitted hosts
    at article scale (STATUS.md round-3 diagnosis).
    """
    fused = None
    if assemble in ("auto", "fused") and not require_image:
        fused_train = _fetch_split_fused(
            data_dir, "train", pipeline, require_text, embeds_type, base_path
        )
        fused_val = _fetch_split_fused(
            data_dir, "val", pipeline, require_text, embeds_type, base_path
        )
        fused = fused_train is not None and fused_val is not None
        if assemble == "fused" and not fused:
            raise ValueError("fused load_data preconditions not met")

    if fused:
        train_X, train_Y, train_feats = fused_train
        val_X, val_Y, val_feats = fused_val
    else:
        train_X, train_Y, train_feats = fetch_split(
            data_dir, "train", pipeline, require_text, require_image,
            embeds_type, base_path
        )
        val_X, val_Y, val_feats = fetch_split(
            data_dir, "val", pipeline, require_text, require_image,
            embeds_type, base_path
        )
        if pipeline == "wh2wh":
            train_X, val_X = train_X[:, :, 6 * 6 :], val_X[:, :, 6 * 6 :]

        train_X, train_Y, train_feats = win_lib.rmv_clips_nan(
            train_X, train_Y, train_feats
        )
        val_X, val_Y, val_feats = win_lib.rmv_clips_nan(val_X, val_Y, val_feats)
    assert not np.any(np.isnan(train_X)) and not np.any(np.isnan(train_Y))
    assert not np.any(np.isnan(val_X)) and not np.any(np.isnan(val_Y))

    # stats are computed and persisted in the reference's (N, D, T)
    # layout.  numpy reductions over a swapaxes VIEW are bitwise-equal to
    # the same reductions over a contiguous copy (test-asserted), so the
    # fused path skips the legacy .astype(float32) materializations.
    if fused:
        tX = np.swapaxes(train_X, 1, 2)
        tY = np.swapaxes(train_Y, 1, 2)
    else:
        tX = np.swapaxes(train_X, 1, 2).astype(np.float32)
        tY = np.swapaxes(train_Y, 1, 2).astype(np.float32)
    mean_X, std_X, mean_Y, std_Y = std_lib.calc_standard(tX, tY, pipeline)
    del tX, tY
    mkdir(model_path)
    std_lib.save_standardization(
        os.path.join(model_path, f"{exp_name}{pipeline}_preprocess_core.npz"),
        mean_X,
        std_X,
        mean_Y,
        std_Y,
    )

    # standardize in NLC: transpose the (1, D, 1) stats to (1, 1, D)
    mX, sX = mean_X.transpose(0, 2, 1), std_X.transpose(0, 2, 1)
    mY, sY = mean_Y.transpose(0, 2, 1), std_Y.transpose(0, 2, 1)
    if fused:
        # all-f32 by construction: subtract/divide in place (bitwise-
        # equal to the legacy expression form, test-asserted)
        for arr, m, s in ((train_X, mX, sX), (val_X, mX, sX),
                          (train_Y, mY, sY), (val_Y, mY, sY)):
            arr -= m
            arr /= s
    else:
        train_X = ((train_X - mX) / sX).astype(np.float32)
        val_X = ((val_X - mX) / sX).astype(np.float32)
        train_Y = ((train_Y - mY) / sY).astype(np.float32)
        val_Y = ((val_Y - mY) / sY).astype(np.float32)

    I = np.arange(len(train_X))
    rng.shuffle(I)
    if fused:
        win_lib.permute_rows_inplace(train_X, I)
        win_lib.permute_rows_inplace(train_Y, I)
        if train_feats is not None:
            win_lib.permute_rows_inplace(train_feats, I)
    else:
        train_X, train_Y = train_X[I], train_Y[I]
        if train_feats is not None:
            train_feats = train_feats[I]

    return dict(
        train_X=train_X,
        train_Y=train_Y,
        val_X=val_X,
        val_Y=val_Y,
        train_feats=train_feats,
        val_feats=val_feats,
        stats=(mean_X, std_X, mean_Y, std_Y),
    )
