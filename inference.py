#!/usr/bin/env python
"""Inference entry point — drop-in CLI for the reference inference.py.

Loads a checkpoint (framework .pkl or reference torch .pth), runs the
jit-compiled enhancement forward on TPU, de-standardizes, writes
r6d/aa/xyz result pickles and renders GIFs.

Reference: /root/reference/inference.py:24-176.
"""

import argparse
import os

import numpy as np

from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils.platform import (
    ensure_platform_from_env,
)

ensure_platform_from_env()

from multimodal_hand_pose_enhancement_for_sign_language_tpu import infer as infer_lib
from multimodal_hand_pose_enhancement_for_sign_language_tpu.data import (
    standardize as std_lib,
    windows as win_lib,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.data.io import load_binary
from multimodal_hand_pose_enhancement_for_sign_language_tpu.models import registry
from multimodal_hand_pose_enhancement_for_sign_language_tpu.train import (
    checkpoint as ckpt_lib,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils.constants import (
    FEATURE_MAP,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.viz import viz_3d


def main(args):
    pipeline = args.pipeline
    feature_in_dim, feature_out_dim = FEATURE_MAP[pipeline]
    print(f"feature_in_dim, feature_out_dim: {feature_in_dim}, {feature_out_dim}")

    # load data
    r6d_path = f"{args.data_dir}/r6d_{args.infer_set}.pkl"
    if args.embeds_type == "normal":
        text_path = f"{args.data_dir}/{args.infer_set}_sentence_embeddings.pkl"
    else:
        text_path = f"{args.data_dir}/average_{args.infer_set}_sentence_embeddings.pkl"
    image_path = f"{args.data_dir}/{args.infer_set}_vid_feats.pkl"
    test_X, test_Y, orig_idx = win_lib.load_windows(
        r6d_path,
        pipeline,
        require_text=args.require_text,
        text_path=text_path,
        require_image=args.require_image,
        image_path=image_path,
        # only the first num_samples NaN-surviving windows are consumed
        # (run_inference caps there, mirroring reference inference.py:96);
        # capping at load time skips equalizing the other ~90% of an
        # article-scale split — pure host-memory churn otherwise
        num_samples=args.num_samples,
        return_indices=True,
    )
    test_feats = None
    if args.require_text or args.require_image:
        test_feats = test_X[1]
        test_X = test_X[0]
    dropped = win_lib.nan_clip_indices(test_X, test_Y, test_feats)
    orig_idx = np.delete(np.asarray(orig_idx, dtype=int), dropped)
    test_X, test_Y, test_feats = win_lib.rmv_clips_nan(
        test_X, test_Y, test_feats, idx_nan=dropped
    )
    assert not np.any(np.isnan(test_X)) and not np.any(np.isnan(test_Y))
    print(f"test_X.shape, test_Y.shape: {test_X.shape}, {test_Y.shape}", flush=True)
    input_feats = test_X.copy()  # (N, T, D) r6d, original scale, pre-slice
    if pipeline == "wh2wh":
        test_X = test_X[:, :, 6 * 6 :]

    # standardize with train-time stats (checkpoint contract)
    checkpoint_dir = os.path.split(args.checkpoint)[0]
    mean_X, std_X, mean_Y, std_Y = std_lib.load_standardization(
        os.path.join(
            checkpoint_dir, f"{args.exp_name}{args.pipeline}_preprocess_core.npz"
        )
    )
    # stats are (1, D, 1) reference layout; transpose for NLC
    mX, sX = mean_X.transpose(0, 2, 1), std_X.transpose(0, 2, 1)
    mY, sY = mean_Y.transpose(0, 2, 1), std_Y.transpose(0, 2, 1)
    test_X = ((test_X - mX) / sX).astype(np.float32)
    test_Y = ((test_Y - mY) / sY).astype(np.float32)

    # model + checkpoint
    module = registry.build_generator(
        args.model,
        test_X.shape[-1],
        feature_out_dim,
        require_text=args.require_text,
        require_image=args.require_image,
    )
    loaded = ckpt_lib.load_checkpoint(args.checkpoint)
    if "generator" in loaded:  # ported torch checkpoint
        variables = loaded["generator"]
    else:
        variables = {
            "params": loaded["state"]["g_params"],
            "batch_stats": loaded["state"]["g_stats"],
        }

    mesh = None
    import jax

    if len(jax.devices()) > 1:
        from multimodal_hand_pose_enhancement_for_sign_language_tpu.parallel import (
            get_mesh,
        )

        mesh = get_mesh()
        print(f"===> data-parallel inference over mesh {mesh}", flush=True)
    output, error = infer_lib.run_inference(
        module,
        variables,
        test_X,
        test_feats=test_feats,
        batch_size=args.batch_size,
        num_samples=args.num_samples,
        test_Y=test_Y,
        bf16=args.bf16,
        mesh=mesh,
        matmul_precision=args.matmul_precision,
    )
    print(">>> TOTAL ERROR: ", error, flush=True)

    # de-standardize and save
    assert not np.any(np.isnan(output))
    output = (output * sY + mY).astype(np.float32)
    xyz_path = infer_lib.save_results(
        input_feats[: output.shape[0]],
        output,
        args.pipeline,
        args.base_path,
        data_dir=args.data_dir,
        tag=args.exp_name,
        infer_set=args.infer_set,
    )
    # persist which ORIGINAL clips the result rows correspond to: the
    # num_samples cap + NaN drops make row j of the results pickles come
    # from clip orig_idx[j] of the split, so per-clip metadata (category
    # labels, text) must be subset with these indices to stay aligned
    if xyz_path:
        from multimodal_hand_pose_enhancement_for_sign_language_tpu.data.io import (
            save_binary,
        )

        save_binary(
            [int(i) for i in orig_idx[: output.shape[0]]],
            os.path.join(
                os.path.dirname(xyz_path), f"sel_indices_{args.infer_set}.pkl"
            ),
        )
    print("Saved results.", flush=True)

    # viz (+ artifact upload, the reference's wandb.save at
    # inference.py:150-152, via the pluggable metrics sink)
    if args.seqs_to_viz > 0 and xyz_path:
        xyz = load_binary(xyz_path)[: args.seqs_to_viz]
        gifs = viz_3d.viz(
            xyz,
            frame_rate=2,
            results_dir=f"viz_results_{args.exp_name}_{args.infer_set}",
        )
        print(f"rendered {len(gifs)} GIFs", flush=True)
        if args.use_wandb:
            from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils.metrics import (
                MetricsSink,
            )

            sink = MetricsSink(args.exp_name, use_wandb=True)
            sink.log({"event": "inference", "error": error, "gifs": len(gifs)})
            for path in gifs:
                sink.save_file(path)
            sink.close()
    return error


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument('--checkpoint', type=str, default="models/lastCheckpoint.pkl", help='path to checkpoint (.pkl or reference .pth)')
    parser.add_argument('--base_path', type=str, default="./", help='base directory where data is stored')
    parser.add_argument('--data_dir', type=str, default="video_data", help='directory where results are stored/loaded')
    parser.add_argument('--pipeline', type=str, default='arm2wh', help='input/output joint pipeline')
    parser.add_argument('--require_text', action='store_true', help='use text embeddings as input')
    parser.add_argument('--require_image', action="store_true", help="use image features as input")
    parser.add_argument('--embeds_type', type=str, default="normal", help='"normal" or "average" text embeds')
    parser.add_argument('--infer_set', type=str, default="test", help='split to run on')
    parser.add_argument('--tag', type=str, default='', help='naming prefix')
    parser.add_argument('--batch_size', type=int, default=128, help='inference batch size')
    parser.add_argument('--seqs_to_viz', type=int, default=2, help='number of sequences to visualize')
    parser.add_argument('--exp_name', type=str, default='experiment', help='experiment name')
    parser.add_argument('--model', type=str, default="v1", help='model architecture')
    parser.add_argument('--num_samples', type=int, default=3000, help='number of sequences to predict')
    parser.add_argument('--bf16', action='store_true', help='EXTENSION: run the forward in bfloat16')
    parser.add_argument('--matmul_precision', type=str, default='tensorfloat32', help="XLA matmul precision: 'tensorfloat32' (3 bf16 MXU passes, 4e-5 MPJPE vs the torch reference — meets the 1e-3 budget at ~1.8x the speed of 'float32'), 'float32' (6 passes, 7.6e-7), or 'bfloat16' (1 pass, fastest, ~5e-3 — over budget)")
    parser.add_argument('--use_wandb', action='store_true', help='upload GIFs/metrics to wandb when available')
    return parser


if __name__ == "__main__":
    args = build_parser().parse_args()
    print(args, flush=True)
    main(args)
