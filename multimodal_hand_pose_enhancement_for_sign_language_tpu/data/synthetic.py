"""Deterministic synthetic How2Sign-like fixtures.

The reference hard-codes cluster dataset paths (proc_text.py:9-13,
proc_vid.py:16-26, proc_categ.py:6-12), so a fake-data generator is the
only way to exercise the full pipeline hermetically.  Two levels:

  * ``make_openpose_tree``   — raw-format fixture: OpenPose per-frame JSON
    directories + `<id> <sentence>` text files + videoID,categoryID CSVs,
    laid out exactly like the How2Sign utterance-level release.
  * ``make_r6d_dataset``     — processed-format fixture: the pickles the
    training/inference entry points consume (r6d_{set}.pkl, xyz_{set}.pkl,
    {set}_sentence_embeddings.pkl, {set}_vid_feats.pkl, categs_{set}.pkl),
    generated through this framework's own geometry ops so they are
    mutually consistent (r6d <-> aa <-> xyz).
"""

from __future__ import annotations

import json
import os

import numpy as np

from multimodal_hand_pose_enhancement_for_sign_language_tpu.data.io import save_binary
from multimodal_hand_pose_enhancement_for_sign_language_tpu.ops import (
    kinematics,
    rotations,
    skeleton,
)

SPLITS = ("train", "val", "test")


def _utt_id(video_idx: int, utt_idx: int) -> str:
    # first 11 characters form the video id (utils/utils.py:180)
    return f"vid{video_idx:08d}-{utt_idx}-rgb_front"


def make_openpose_tree(
    root: str,
    n_videos: int = 2,
    utts_per_video: int = 2,
    frames: int = 8,
    seed: int = 0,
):
    """Write a raw OpenPose-format dataset under `root`.

    Returns dict with 'dataset_path', 'text_paths', 'categ_paths'.
    """
    rng = np.random.RandomState(seed)
    text_paths, categ_paths = {}, {}
    for split in SPLITS:
        json_root = os.path.join(
            root, split, "rgb_front", "features", "openpose_output", "json"
        )
        os.makedirs(json_root, exist_ok=True)
        lines = []
        categ_rows = ["videoID,categoryID"]
        for v in range(n_videos):
            vid = _utt_id(v, 0)[:11]
            categ_rows.append(f"{vid},{1 + (v % 9)}")
            for u in range(utts_per_video):
                uid = _utt_id(v, u)
                utt_dir = os.path.join(json_root, uid)
                os.makedirs(utt_dir, exist_ok=True)
                lines.append(f"{uid} synthetic sentence about topic {v}.")
                for t in range(frames):
                    body = rng.uniform(100, 500, size=25 * 3)
                    body[2::3] = rng.uniform(0.5, 1.0, size=25)
                    rh = rng.uniform(100, 500, size=21 * 3)
                    rh[2::3] = rng.uniform(0.5, 1.0, size=21)
                    lh = rng.uniform(100, 500, size=21 * 3)
                    lh[2::3] = rng.uniform(0.5, 1.0, size=21)
                    frame = {
                        "people": [
                            {
                                "pose_keypoints_2d": body.tolist(),
                                "hand_right_keypoints_2d": rh.tolist(),
                                "hand_left_keypoints_2d": lh.tolist(),
                            }
                        ]
                    }
                    fname = f"{uid}_{t:012d}_keypoints.json"
                    with open(os.path.join(utt_dir, fname), "w") as f:
                        json.dump(frame, f)
        text_path = os.path.join(root, f"{split}.text.id.en")
        with open(text_path, "w") as f:
            f.write("\n".join(lines) + "\n")
        text_paths[split] = text_path
        categ_path = os.path.join(root, f"videoID_categoryID_{split}.csv")
        with open(categ_path, "w") as f:
            f.write("\n".join(categ_rows) + "\n")
        categ_paths[split] = categ_path
    return {
        "dataset_path": root,
        "text_paths": text_paths,
        "categ_paths": categ_paths,
    }


# --- finger_signal chain constants (see make_r6d_dataset docstring) ---
_N_HAND_AA = 126  # 42 hand bones x 3 aa channels (cols 18..144)
_CHAIN_RHO = 0.985  # per-channel-step correlation: info decays ~rho^d
_CHAIN_ALPHA = 0.6  # innovation share that is text-predictable


def _finger_chain(frng, T):
    """One clip's hand-channel Markov chain (T, 126) plus the clip-level
    latent parameters theta (27,) that the text embeddings carry.

    All series have marginal variance ~0.5 (unit-amplitude sinusoids
    with uniform random phase), so the chain is variance-stationary:
    the conditional std of channel j given the nearest visible channel
    at distance d is sqrt(1 - rho^(2d)) of its marginal std — the
    monotone-in-d error floor the finger-masking trend measures."""
    t = np.arange(T, dtype=np.float64)[:, None]
    a = frng.uniform(0.7, 1.3, size=6)
    w = frng.uniform(0.05, 0.45, size=6)
    p = frng.uniform(0, 2 * np.pi, size=6)
    wu = frng.uniform(0.1, 0.5)
    pu = frng.uniform(0, 2 * np.pi)
    we = frng.uniform(0.05, 0.6, size=_N_HAND_AA)
    pe = frng.uniform(0, 2 * np.pi, size=_N_HAND_AA)
    z = a * np.sin(w * t + p)  # (T, 6) smooth per-clip latent driver
    s = z.sum(axis=1) / np.sqrt(6.0)  # chain root, var ~ 0.5
    j = np.arange(_N_HAND_AA, dtype=np.float64)
    u = np.sin(wu * t + pu + 0.35 * j)  # text-predictable innovations
    eta = np.sin(we * t + pe)  # private per-channel noise
    innov = _CHAIN_ALPHA * u + np.sqrt(1.0 - _CHAIN_ALPHA**2) * eta
    c = np.sqrt(1.0 - _CHAIN_RHO**2)
    S = np.empty((T, _N_HAND_AA))
    for jj in range(_N_HAND_AA):
        s = _CHAIN_RHO * s + c * innov[:, jj]
        S[:, jj] = s
    theta = np.concatenate(
        [
            (a - 1.0) / 0.3,
            (w - 0.25) / 0.2,
            np.sin(p),
            np.cos(p),
            [(wu - 0.3) / 0.2, np.sin(pu), np.cos(pu)],
        ]
    )
    return S, theta


def make_r6d_dataset(
    data_dir: str,
    n_clips: int = 6,
    t_range: tuple[int, int] = (40, 240),
    seed: int = 0,
    text_dim: int = 512,
    image_dim: int = 2000,
    split_counts: dict | None = None,
    save_image_feats: bool = True,
    ik_roundtrip: bool = True,
    categ_signal: bool = False,
    finger_signal: bool = False,
):
    """Write processed pickles for all three splits under `data_dir`.

    The r6d data is geometrically valid: random smooth axis-angle curves
    run through FK to xyz, back through IK to aa, then to r6d — matching
    what the real pipeline produces.

    `split_counts` overrides the per-split clip counts (e.g. the article
    scale {'train': 31128, 'val': 1741, 'test': 2322}, §5 of the PDF);
    `save_image_feats=False` skips the (T, 2000) per-clip ResNet-feature
    pickles, which dominate disk at article scale.

    By default the categoryID labels (`1 + i % 9`) carry no information
    about the pose/text content (so classifier accuracy on the fixture is
    chance — the honest default for plumbing tests).  `categ_signal=True`
    makes the labels learnable: each class k adds a distinct per-frame
    angular oscillation frequency to the axis-angle curves (which survives
    the FK→IK→r6d round trip into the classifier's input windows) and a
    class centroid to the sentence embeddings — so the downstream LSTM /
    text-MLP surrogate evaluation (article §5.2,
    /root/reference/H2Sclassifier/Train_Test/main.py:23-121) can be
    tested for actual above-chance learning, not just plumbing.  The
    default-False path consumes the RNG identically with or without this
    flag, so existing fixtures stay byte-identical.

    `finger_signal=True` additionally gives the HAND channels the
    information structure the incremental finger-masking experiment
    (article Table 2, /root/reference/launch_exp_incr_fingers.sh:10)
    needs to show its monotone degradation: each hand aa-channel j
    carries a stationary Markov chain over the channel index,

        s_j(t) = rho * s_{j-1}(t) + sqrt(1-rho^2) * innov_j(t),

    rooted in a per-clip smooth latent z(t) whose parameters are ALSO
    linearly embedded into the sentence embeddings (so text conditioning
    genuinely helps), with innovations split between a text-predictable
    component u_j(t) and private per-channel noise eta_j(t).  Because
    arm_wh2fingerK masks the LAST 4K hand bones (utils/constants.py
    FEATURE_MAP) and chain information decays geometrically with
    distance from the nearest visible channel, the best achievable
    masked-channel L1 rises STRICTLY with K — masking more fingers
    destroys recoverable signal, which is exactly Table 2's shape
    (0.320 -> 0.418 over the sweep).  Hand-channel amplitudes are scaled
    so per-bone axis-angle norms stay below pi (the aa -> r6d map is
    injective only under pi; folds would scramble the chain's
    information decay).  Consumes only side-stream RNGs, so
    categ_signal-only fixtures stay byte-identical.
    """
    os.makedirs(data_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    structure = skeleton.get_skeletal_model_structure()
    root = np.array([0.0, 0.0, 0.0, 0.0, 1.0, 0.0], dtype=np.float32)
    bone_len = rng.uniform(0.5, 1.5, size=(skeleton.N_BONES,)).astype(np.float32)

    out = {}
    for split in SPLITS:
        if split_counts is not None:
            n = int(split_counts[split])
        else:
            n = n_clips if split == "train" else max(2, n_clips // 2)
        frng = (
            np.random.RandomState(seed * 1000003 + 9100 + SPLITS.index(split))
            if finger_signal
            else None
        )
        thetas = []
        aa_clips = []
        for i in range(n):
            T = int(rng.randint(*t_range))
            base = rng.uniform(0.3, 1.0, size=(1, 144))
            wob = 0.1 * np.sin(
                np.linspace(0, 6, T)[:, None] + rng.uniform(0, 3, size=(1, 144))
            )
            clip = base + wob
            csig = None
            if categ_signal:
                # class k's signature: a per-class mean angular offset
                # (readable at any timestep) plus a distinct per-frame
                # oscillation frequency (periods ~5..23 frames, well
                # inside one 192-frame classifier window), on every joint
                # channel; deterministic in k, so the main RNG stream is
                # untouched
                k = 1 + (i % 9)
                omega = 0.15 + 0.12 * k
                t = np.arange(T, dtype=np.float64)[:, None]
                c = np.arange(144, dtype=np.float64)[None, :]
                csig = 0.08 * k + 0.35 * np.sin(omega * t + 0.5 * c)
            if finger_signal:
                S, theta = _finger_chain(frng, T)
                thetas.append(theta)
                # hand channels (bones 6..47 -> aa cols 18..144): damped
                # base/wob plus the chain; amplitudes keep per-bone |aa|
                # under pi so no rotation fold scrambles the chain.  Arm
                # channels (cols 0..18) keep the full class signature —
                # the classifier surrogate stays discriminative.
                clip[:, 18:] = (
                    0.25 * base[:, 18:] + 0.5 * wob[:, 18:] + 0.8 * S
                )
                if csig is not None:
                    csig = csig * np.concatenate(
                        [np.ones(18), np.full(_N_HAND_AA, 0.35)]
                    )[None, :]
            if csig is not None:
                clip = clip + csig
            aa_clips.append(clip.astype(np.float32))
        xyz = kinematics.aa_to_xyz(aa_clips, root, bone_len, structure)
        # ik_roundtrip maps the angles through IK's canonical form (what
        # the real pipeline's xyz->aa produces); xyz == FK(aa) holds
        # either way, so article-scale fixtures skip the costly IK pass
        aa_final = (
            kinematics.xyz_to_aa(xyz, structure) if ik_roundtrip else aa_clips
        )
        r6d = rotations.aa_to_rot6d(aa_final)
        save_binary(r6d, os.path.join(data_dir, f"r6d_{split}.pkl"))
        save_binary(xyz, os.path.join(data_dir, f"xyz_{split}.pkl"))

        embeds = rng.randn(n, text_dim).astype(np.float32)
        if categ_signal:
            # class centroids from a fixed side-stream (the main RNG is
            # not consumed), strong enough for a linear probe / the
            # SentenceClassifier MLP to separate
            cents = np.random.RandomState(seed + 4242).randn(9, text_dim)
            embeds = embeds + 2.0 * cents[
                np.arange(n) % 9
            ].astype(np.float32)
        if finger_signal:
            # the chain's clip-level latent parameters ride in the text
            # embeddings through a fixed projection (side-stream RNG), so
            # text conditioning carries genuine finger-channel info — the
            # article's premise that language helps hand enhancement
            proj = np.random.RandomState(seed + 5151).randn(27, text_dim)
            proj /= np.sqrt(27.0)
            embeds = embeds + 1.5 * (
                np.stack(thetas) @ proj
            ).astype(np.float32)
        save_binary(embeds, os.path.join(data_dir, f"{split}_sentence_embeddings.pkl"))
        save_binary(
            np.tile(embeds.mean(axis=0), (n, 1)),
            os.path.join(data_dir, f"average_{split}_sentence_embeddings.pkl"),
        )
        if save_image_feats:
            feats = [
                rng.randn(c.shape[0], image_dim).astype(np.float32)
                for c in r6d
            ]
            save_binary(
                feats, os.path.join(data_dir, f"{split}_vid_feats.pkl")
            )
        categs = [1 + (i % 9) for i in range(n)]
        save_binary(categs, os.path.join(data_dir, f"categs_{split}.pkl"))
        out[split] = dict(n=n)
    return out


def make_video_tree(
    root: str,
    height: int = 360,
    width: int = 480,
    seed: int = 0,
):
    """Write a tiny .mp4 per utterance of an existing openpose tree
    (layout: {split}/rgb_front/raw_videos/{utt_id}.mp4 — the reference's
    VID_PATHS shape, proc_vid.py:16-26).  Needs cv2."""
    import cv2

    rng = np.random.RandomState(seed)
    out = {}
    for split in SPLITS:
        json_root = os.path.join(
            root, split, "rgb_front", "features", "openpose_output", "json"
        )
        vid_dir = os.path.join(root, split, "rgb_front", "raw_videos")
        os.makedirs(vid_dir, exist_ok=True)
        ids = sorted(os.listdir(json_root)) if os.path.isdir(json_root) else []
        for uid in ids:
            n_frames = len(os.listdir(os.path.join(json_root, uid)))
            path = os.path.join(vid_dir, uid + ".mp4")
            writer = cv2.VideoWriter(
                path, cv2.VideoWriter_fourcc(*"mp4v"), 24.0, (width, height)
            )
            for _ in range(n_frames):
                writer.write(rng.randint(0, 255, size=(height, width, 3), dtype=np.uint8))
            writer.release()
        out[split] = vid_dir
    return out
