#!/usr/bin/env python
"""Dataset construction driver — CLI for the process_H2S_dataset path
(reference utils/utils.py:430-571), with the stages the reference left
commented out (:488-554) actually runnable behind flags: lifting, r6d
conversion, bone lengths.

Reads an OpenPose-format dataset tree (see data/synthetic.make_openpose_tree
for the expected layout), writes the xy/xyz/r6d/lengths pickles into
--data_dir.
"""

import argparse
import os

import numpy as np

from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils.platform import (
    ensure_platform_from_env,
)

ensure_platform_from_env()

from multimodal_hand_pose_enhancement_for_sign_language_tpu.data import (  # noqa: E402
    categories as categ_lib,
    openpose,
    text as text_lib,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.data.io import (  # noqa: E402
    mkdir,
    save_binary,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.lifting import (  # noqa: E402
    engine as lift_engine,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.ops import (  # noqa: E402
    kinematics,
    rotations,
    skeleton,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils.constants import (  # noqa: E402
    ARMS,
    DATA_PATHS,
    HANDS,
    NECK,
)


def process_split(args, split: str):
    json_dir = os.path.join(args.dataset_path, DATA_PATHS[split])
    if not os.path.isdir(json_dir):
        print(f"[{split}] no json dir at {json_dir}; skipping", flush=True)
        return
    ids = sorted(os.listdir(json_dir))

    # intersect with ids that have text (and optionally categories)
    text_path = args.text_path_template.format(split=split)
    if os.path.exists(text_path):
        text_ids = text_lib.get_clip_ids(text_path)
        ids = sorted(set(ids) & set(text_ids))
    print(f"[{split}] {len(ids)} utterances", flush=True)
    if args.subset < 1.0:
        ids = ids[: int(len(ids) * args.subset)]

    clips, in_feats, out_feats = openpose.load_utterances_parallel(
        ids, json_dir, max_workers=args.workers
    )
    if args.group_by_clip:
        clips, in_feats, out_feats = openpose.group_clips(clips, in_feats, out_feats)

    neck = openpose.select_keypoints(in_feats, NECK)
    arms = openpose.select_keypoints(in_feats, ARMS)
    hands = openpose.select_keypoints(out_feats, HANDS)
    feats = openpose.hconcat_feats(neck, arms, hands)
    xy_path = os.path.join(args.data_dir, f"xy_{split}.pkl")
    save_binary(feats, xy_path)
    # reference file-name contract (utils/utils.py:431-434,464-466):
    # {groupByKey}_conf{keep_confidence}_xy_{split}.pkl with groupByKey
    # "True" when grouping and "" otherwise; hard-link to avoid a second
    # multi-GB pickle write
    group_key = "True" if args.group_by_clip else ""
    ref_path = os.path.join(args.data_dir, f"{group_key}_confTrue_xy_{split}.pkl")
    if os.path.exists(ref_path):
        os.unlink(ref_path)
    try:
        os.link(xy_path, ref_path)
    except OSError:
        import shutil

        shutil.copyfile(xy_path, ref_path)
    print(f"[{split}] wrote {xy_path} (+ {os.path.basename(ref_path)})", flush=True)

    # text embeddings (precomputed-first: see data/text.py)
    if os.path.exists(text_path):
        embeds = text_lib.obtain_embeddings(
            text_path, ids, method=args.text_method, groupByClip=args.group_by_clip
        )
        if embeds is not None:
            save_binary(
                np.asarray(embeds),
                os.path.join(args.data_dir, f"{split}_sentence_embeddings.pkl"),
            )
            # the --embeds_type average variant (proc_text.py:133-139)
            save_binary(
                text_lib.average_embeds(embeds),
                os.path.join(
                    args.data_dir,
                    f"average_{split}_sentence_embeddings.pkl",
                ),
            )

    # categories
    categ_path = args.categ_path_template.format(split=split)
    if os.path.exists(categ_path):
        id_categ = categ_lib.get_ids_categ(categ_path)
        if args.group_by_clip:
            categs = [v for _, v in sorted(id_categ.items())]
        else:
            categs = categ_lib.get_clips_categ(clips, id_categ)
        save_binary(categs, os.path.join(args.data_dir, f"categs_{split}.pkl"))

    # hand-crop extraction / ResNet features — the reference's canonical
    # (commented-out) b2h continuation, utils/utils.py:536-554 /
    # proc_vid.py:244-254, runnable behind flags
    if args.crops or args.vid_feats:
        from multimodal_hand_pose_enhancement_for_sign_language_tpu.data import (
            datasets as datasets_lib,
        )

        paths = datasets_lib.DatasetPaths(
            args.dataset_path,
            text_template=args.text_path_template,
            categ_template=args.categ_path_template,
            vid_template=args.vid_template,
        )
        if not os.path.isdir(paths.vid_dir(split)):
            print(f"[{split}] no videos at {paths.vid_dir(split)}; skipping crops", flush=True)
        elif args.vid_feats:
            datasets_lib.obtain_vid_crops_and_feats(
                paths, split, args.data_dir, weights_path=args.resnet_weights,
                chunk=args.vid_chunk,
            )
            print(f"[{split}] wrote {split}_vid_feats.pkl", flush=True)
        else:
            datasets_lib.obtain_vid_crops(
                paths, split, args.data_dir, chunk=args.vid_chunk
            )
            print(f"[{split}] wrote {split}_vid_crops.pkl", flush=True)

    if args.lift:
        mesh = None
        import jax

        if len(jax.devices()) > 1:
            from multimodal_hand_pose_enhancement_for_sign_language_tpu.parallel import (
                get_mesh,
            )

            mesh = get_mesh()
            print(f"[{split}] lifting over mesh {mesh}", flush=True)
        xyz_path = os.path.join(args.data_dir, f"xyz_{split}.pkl")
        lift_engine.lift_2d_to_3d(
            feats,
            xyz_path,
            nPartitions=args.n_partitions,
            n_cycles=args.n_cycles,
            mesh=mesh,
        )
        print(f"[{split}] lifted -> {xyz_path}", flush=True)

        from multimodal_hand_pose_enhancement_for_sign_language_tpu.data.io import (
            load_binary,
        )

        xyz = load_binary(xyz_path)
        structure = skeleton.get_skeletal_model_structure()
        if split == "train":
            lengths = kinematics.get_bone_length(xyz, structure)
            save_binary(lengths, os.path.join(args.data_dir, "lengths_train.pkl"))
        aa = kinematics.xyz_to_aa(xyz, structure)
        r6d = rotations.aa_to_rot6d(aa)
        save_binary(r6d, os.path.join(args.data_dir, f"r6d_{split}.pkl"))
        print(f"[{split}] wrote r6d", flush=True)


def main(args):
    mkdir(args.data_dir)
    for split in ("test", "val", "train"):
        process_split(args, split)


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_path", type=str, required=True, help="root of the OpenPose-format dataset")
    parser.add_argument("--data_dir", type=str, default="video_data", help="output directory")
    parser.add_argument("--text_path_template", type=str, default="{split}.text.id.en", help="per-split text id file (relative or absolute; {split} substituted)")
    parser.add_argument("--categ_path_template", type=str, default="videoID_categoryID_{split}.csv", help="per-split category csv")
    parser.add_argument("--text_method", type=str, default="precomputed", help="text embedding method (precomputed|BERTsentence|clip|BERTword)")
    parser.add_argument("--subset", type=float, default=1.0, help="fraction of utterances to keep")
    parser.add_argument("--group_by_clip", action=argparse.BooleanOptionalAction, default=True, help="group utterances into videos (reference default); --no-group_by_clip for utterance-level")
    parser.add_argument("--lift", action="store_true", help="run 2D->3D lifting + r6d conversion")
    parser.add_argument("--crops", action="store_true", help="extract 120x120 hand crops from videos (reference utils/utils.py:536-545)")
    parser.add_argument("--vid_feats", action="store_true", help="extract crops AND ResNet-50 hand features (reference utils/utils.py:547-554)")
    parser.add_argument("--vid_template", type=str, default="{split}/rgb_front/raw_videos", help="per-split video directory (relative to dataset root or absolute)")
    parser.add_argument("--resnet_weights", type=str, default=None, help="torchvision resnet50 .pth to convert for the flax featurizer")
    parser.add_argument("--vid_chunk", type=int, default=500, help="clips per persisted crops/feats chunk")
    parser.add_argument("--n_partitions", type=int, default=40, help="lifting checkpoint partitions")
    parser.add_argument("--n_cycles", type=int, default=900, help="lifting SGD cycles")
    parser.add_argument("--workers", type=int, default=None, help="ingestion processes")
    return parser


if __name__ == "__main__":
    args = build_parser().parse_args()
    # allow templates relative to the dataset root
    if not os.path.isabs(args.text_path_template) and not os.path.exists(
        args.text_path_template.format(split="train")
    ):
        args.text_path_template = os.path.join(
            args.dataset_path, args.text_path_template
        )
        args.categ_path_template = os.path.join(
            args.dataset_path, args.categ_path_template
        )
    main(args)
