"""Video featurizer: hand-crop extraction + CNN features.

Re-design of proc_vid.py (/root/reference/proc_vid.py).  Paths are
arguments; cv2-dependent video decoding is import-gated; the crop
geometry is pure NumPy; CNN feature extraction uses the framework's own
flax ResNet-50 (models/resnet.py) so the hot path is XLA on TPU —
torchvision weights convert via `models.resnet.from_torchvision_state`.

NB reference bug reproduced optionally: crop_clip returns inside its
frame loop (proc_vid.py:94), so only frame 0 is ever cropped; pass
`faithful_first_frame_bug=True` for bit-parity with artifacts produced by
the reference, default is the evident intent (all frames).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

CROP_HW = (120, 120)
HAND_KEYPOINT_IDS = [5, 9, 13, 17]  # MP joints used for the palm center
FALLBACK_CENTER = (700, 700)  # proc_vid.py:320-321


def load_clip(path: str) -> np.ndarray:
    """mp4 -> (T, C, H, W) uint8 RGB (proc_vid.py:31-43); needs cv2."""
    import cv2

    frames = []
    cap = cv2.VideoCapture(path)
    ret = True
    while ret:
        ret, img = cap.read()
        if ret:
            frames.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
    video = np.stack(frames, axis=0)
    return np.moveaxis(video, 3, 1)


def get_vid_ids(vid_dir: str) -> list:
    """Ids of clips with an .mp4 present (proc_vid.py:66-68)."""
    return [x[:-4] for x in os.listdir(vid_dir) if x.endswith(".mp4")]


def get_hand_center(keypoints_json: Optional[dict], hand: str = "right"):
    """Mean of the palm keypoints, fallback (700, 700) if json missing
    (proc_vid.py:312-336)."""
    if keypoints_json is None:
        return FALLBACK_CENTER
    kp = keypoints_json["people"][0][f"hand_{hand}_keypoints_2d"]
    xs = [kp[i * 3] for i in HAND_KEYPOINT_IDS]
    ys = [kp[i * 3 + 1] for i in HAND_KEYPOINT_IDS]
    return (float(np.mean(xs)), float(np.mean(ys)))


def crop_frame(frame_hwc: np.ndarray, center, size=CROP_HW) -> np.ndarray:
    """Pad-and-crop a (H, W, C) frame around `center`
    (proc_vid.py:281-309)."""
    h, w = size
    # reference arithmetic truncates (proc_vid.py:297): int(middle - s/2)
    top = int(np.floor(center[1])) - h // 2
    left = int(np.floor(center[0])) - w // 2
    H, W, C = frame_hwc.shape
    out = np.zeros((h, w, C), frame_hwc.dtype)
    src_t, src_l = max(top, 0), max(left, 0)
    src_b, src_r = min(top + h, H), min(left + w, W)
    if src_b > src_t and src_r > src_l:
        dst_t, dst_l = src_t - top, src_l - left
        out[dst_t : dst_t + (src_b - src_t), dst_l : dst_l + (src_r - src_l)] = (
            frame_hwc[src_t:src_b, src_l:src_r]
        )
    return out


def crop_clip(
    clip: np.ndarray,
    clip_id: str,
    input_json_folder: str,
    faithful_first_frame_bug: bool = False,
) -> np.ndarray:
    """(T, C, H, W) -> (T, C, 120, 120, 2) right/left hand crops
    (proc_vid.py:70-94)."""
    T = clip.shape[0]
    out = np.zeros((T, clip.shape[1], *CROP_HW, 2), np.uint8)
    hands = {0: "right", 1: "left"}
    n_frames = 1 if faithful_first_frame_bug else T
    for i in range(n_frames):
        json_filename = os.path.join(
            input_json_folder, f"{clip_id}_{i:012d}_keypoints.json"
        )
        try:
            keypoints_json = json.load(open(json_filename))
        except Exception:
            keypoints_json = None
        frame = np.moveaxis(clip[i], 0, -1)
        for j in range(2):
            center = get_hand_center(keypoints_json, hand=hands[j])
            out[i, :, :, :, j] = np.moveaxis(crop_frame(frame, center), -1, 0)
    return out


def obtain_cropped_clips(clip_list, json_root: str, s_ids, **kwargs) -> list:
    """Crop every clip (replaces Pool(24), proc_vid.py:244-254)."""
    return [
        crop_clip(c, sid, os.path.join(json_root, sid), **kwargs)
        for c, sid in zip(clip_list, s_ids)
    ]


# ---------------------------------------------------------------------------
# CNN features
# ---------------------------------------------------------------------------

IMAGENET_MEAN = np.array([123.68, 116.779, 103.939], np.float32)
IMAGENET_STD = np.array([58.393, 57.12, 57.375], np.float32)


def obtain_feats_crops_clip(crops_list, weights_path: str | None = None) -> list:
    """CLIP ViT-B/32 image features per hand (proc_vid.py:111-142).

    With `weights_path` (a local HF CLIP snapshot) the features run
    through the JAX-native CLIPVisionEncoder (models/clip_vision.py) —
    torch only reads the checkpoint.  Without it, falls back to the
    `clip` package (needs downloads)."""
    if weights_path is not None:
        return _obtain_feats_crops_clip_flax(crops_list, weights_path)

    import clip
    import torch
    from PIL import Image

    model, preprocess = clip.load("ViT-B/32", "cpu")

    def embed(frames_tchw):
        imgs = [
            preprocess(Image.fromarray(np.moveaxis(f, 0, -1).astype(np.uint8), "RGB"))
            for f in frames_tchw
        ]
        with torch.no_grad():
            return model.encode_image(torch.stack(imgs)).cpu().numpy()

    return [
        np.hstack((embed(c[..., 0]), embed(c[..., 1]))) for c in crops_list
    ]


def _obtain_feats_crops_clip_flax(crops_list, weights_path: str) -> list:
    """CLIP image features via the flax vision tower (one jitted batched
    forward per hand stream)."""
    import jax

    from multimodal_hand_pose_enhancement_for_sign_language_tpu.models import (
        clip_vision,
    )

    import torch
    from transformers import AutoModel

    hf = AutoModel.from_pretrained(weights_path, local_files_only=True)
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    vcfg = getattr(hf.config, "vision_config", hf.config)
    model = clip_vision.CLIPVisionEncoder(
        hidden_size=vcfg.hidden_size,
        num_layers=vcfg.num_hidden_layers,
        num_heads=vcfg.num_attention_heads,
        intermediate_size=vcfg.intermediate_size,
        image_size=vcfg.image_size,
        patch_size=vcfg.patch_size,
        projection_dim=getattr(hf.config, "projection_dim", vcfg.hidden_size),
    )
    variables = clip_vision.clip_vision_from_hf_state(sd)
    fwd = jax.jit(lambda px: model.apply(variables, px))

    def embed(frames_tchw):
        px = clip_vision.clip_preprocess(
            np.moveaxis(np.asarray(frames_tchw), 1, -1), vcfg.image_size
        )
        return np.asarray(fwd(px))

    return [np.hstack((embed(c[..., 0]), embed(c[..., 1]))) for c in crops_list]


# ---------------------------------------------------------------------------
# debug / inspection utilities (reference proc_vid.py:255-377)
# ---------------------------------------------------------------------------


def save_as_mp4(vid, fps: int = 25, filename: str = "testing.avi"):
    """(T, C, H, W) RGB -> video file (proc_vid.py:256-262); needs cv2."""
    import cv2

    T, _, H, W = vid.shape
    writer = cv2.VideoWriter(
        filename, cv2.VideoWriter_fourcc(*"PIM1"), fps, (W, H), True
    )
    for i in range(T):
        x = np.moveaxis(vid[i], 0, -1)
        writer.write(np.uint8(x[..., ::-1]))
    writer.release()
    return filename


def overlap_vid_points(vid, points):
    """Paint (row, col) keypoints as red squares on a (T, H, W, C) video
    (proc_vid.py:267-276)."""
    out = vid.copy()
    for t in range(vid.shape[0]):
        p = points[t, :]
        for i in range(0, len(p), 2):
            r, c = int(p[i]), int(p[i + 1])
            out[t, r - 3 : r + 3, c - 3 : c + 3, 0] = 255
            out[t, r - 3 : r + 3, c - 3 : c + 3, 1:] = 0
    return out


def obtain_feats_crops_resnet(
    crops_list,
    weights_path: Optional[str] = None,
    batch_size: int = 256,
) -> list:
    """(T, C, 120, 120, 2) crops -> (T, 2000) features, 1000 per hand
    (proc_vid.py:145-203), via the flax ResNet-50 on the default backend.

    `weights_path`: torchvision resnet50 .pth to convert; random init if
    absent (feature quality then meaningless, but pipeline runs).
    """
    import jax
    import jax.numpy as jnp

    from multimodal_hand_pose_enhancement_for_sign_language_tpu.models import resnet

    model = resnet.ResNet50(num_classes=1000)
    variables = resnet.load_variables(model, weights_path)

    @jax.jit
    def fwd(x):
        return model.apply(variables, x, train=False)

    def extract(frames_tchw: np.ndarray) -> np.ndarray:
        # (N, C, H, W) uint8 -> normalized NHWC
        x = frames_tchw.astype(np.float32)
        x = np.moveaxis(x, 1, -1)
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        outs = []
        for s in range(0, x.shape[0], batch_size):
            outs.append(np.asarray(fwd(jnp.asarray(x[s : s + batch_size]))))
        return np.concatenate(outs, axis=0)

    feats_list = []
    for crop in crops_list:
        r = extract(crop[:, :, :, :, 0])
        l = extract(crop[:, :, :, :, 1])
        feats_list.append(np.hstack((r, l)).astype(np.float32))
    return feats_list
