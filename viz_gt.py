#!/usr/bin/env python
"""Ground-truth visualization CLI — the reference viz/viz_3d.py __main__
(viz_GT, :80-116): load r6d windows, convert through save_results, render
the first N sequences to GIFs."""

import argparse
import os

import numpy as np

from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils.platform import (
    ensure_platform_from_env,
)

ensure_platform_from_env()

from multimodal_hand_pose_enhancement_for_sign_language_tpu import infer as infer_lib  # noqa: E402
from multimodal_hand_pose_enhancement_for_sign_language_tpu.data import (  # noqa: E402
    windows as win_lib,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.data.io import (  # noqa: E402
    load_binary,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.viz import viz_3d  # noqa: E402


def main(args):
    # direct mode: visualize an existing xyz pickle (reference --file_path)
    if args.file_path and os.path.exists(args.file_path):
        xyz = load_binary(args.file_path)[: args.seqs_to_viz]
        gifs = viz_3d.viz(xyz, frame_rate=2, results_dir=args.results_dir)
        print(f"rendered {len(gifs)} GIFs from {args.file_path}", flush=True)
        return gifs

    r6d_path = f"{args.data_dir}/r6d_{args.infer_set}.pkl"
    X, Y = win_lib.load_windows(r6d_path, args.pipeline)
    X, Y, _ = win_lib.rmv_clips_nan(
        X[: args.seqs_to_viz + 10], Y[: args.seqs_to_viz + 10]
    )
    xyz_path = infer_lib.save_results(
        X[: args.seqs_to_viz],
        Y[: args.seqs_to_viz],
        args.pipeline,
        args.base_path,
        data_dir=args.data_dir,
        tag=f"{args.exp_name}_{args.infer_set}",
        infer_set=args.infer_set,
    )
    xyz = load_binary(xyz_path)[: args.seqs_to_viz]
    results_dir = (
        args.results_dir
        if args.results_dir != "viz_results"
        else f"viz_results_{args.exp_name}_{args.infer_set}"
    )
    gifs = viz_3d.viz(xyz, frame_rate=2, results_dir=results_dir)
    print(f"rendered {len(gifs)} GIFs", flush=True)
    return gifs


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument('--base_path', type=str, default="./")
    parser.add_argument('--file_path', type=str, default="", help='existing xyz pickle to visualize directly (skips save_results)')
    parser.add_argument('--seqs_to_viz', type=int, default=20)
    parser.add_argument('--pipeline', type=str, default='arm2wh')
    parser.add_argument('--results_dir', type=str, default="viz_results")
    parser.add_argument('--data_dir', type=str, default="video_data")
    parser.add_argument('--infer_set', type=str, default="test")
    parser.add_argument('--exp_name', type=str, default='experiment')
    args = parser.parse_args()
    main(args)
