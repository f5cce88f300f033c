#!/usr/bin/env python
"""MLP sentence-classifier entry point — drop-in CLI for the reference
H2Sclassifier/Train_Test/MLP_main.py: MiniLM sentence embeddings ->
10-way topic classification (the 77%-val-accuracy text baseline)."""

import argparse
import os

import numpy as np

from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils.platform import (
    ensure_platform_from_env,
)

ensure_platform_from_env()

import jax  # noqa: E402

from multimodal_hand_pose_enhancement_for_sign_language_tpu.data.io import (  # noqa: E402
    load_binary,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.models.classifier import (  # noqa: E402
    SentenceClassifier,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.train import (  # noqa: E402
    checkpoint as ckpt_lib,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.train.classifier import (  # noqa: E402
    ClassifierTrainer,
    dump_gt_pred_csv,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils.metrics import (  # noqa: E402
    MetricsSink,
)


def load_mlp_data(data_dir: str, key: str):
    """Sentence embeddings + categories (MLP_main.py load_data)."""
    X = np.asarray(load_binary(f"{data_dir}/{key}_sentence_embeddings.pkl"), np.float32)
    Y = np.asarray(load_binary(f"{data_dir}/categs_{key}.pkl"))
    return X, Y


def main(args):
    exp_name = (
        f"{args.data_dir.split('/')[-1]}__{args.num_epochs}__{args.batch_size}"
        f"__{args.learning_rate}__{args.weight_decay}__{args.optimizer}"
    )
    sink = MetricsSink(exp_name, out_dir=args.models_dir, use_wandb=args.use_wandb)

    X_train, Y_train = load_mlp_data(args.data_dir, "train")
    X_val, Y_val = load_mlp_data(args.data_dir, "val")
    print(f"X_train {X_train.shape}, X_val {X_val.shape}", flush=True)

    module = SentenceClassifier(in_dim=X_train.shape[-1])
    trainer = ClassifierTrainer(
        module,
        learning_rate=args.learning_rate,
        weight_decay=args.weight_decay,
        optimizer=args.optimizer,
        last_timestep_only=False,
    )
    params, opt_state = trainer.init_state(jax.random.PRNGKey(1), X_train[:2])
    shuffle_rng = np.random.RandomState(23456)

    curr_best_acc = 0.0
    rng_key = jax.random.PRNGKey(2)
    for epoch in range(args.num_epochs):
        params, opt_state, tr_losses, tr_acc, rng_key = trainer.train_epoch(
            params, opt_state, X_train, Y_train, args.batch_size, rng_key
        )
        val_loss, val_acc, (GT, predY) = trainer.val_epoch(
            params, X_val, Y_val, args.batch_size
        )
        sink.log(
            {
                "epoch": epoch,
                "loss_train": float(np.mean(tr_losses)) if tr_losses else 0.0,
                "loss_val": val_loss,
                "acc_train": tr_acc,
                "acc_val": val_acc,
            }
        )
        if epoch % args.log_step == 0:
            print(f"Epoch {epoch}: Tr. acc={tr_acc:.4f} Val. acc={val_acc:.4f}", flush=True)
        if val_acc > curr_best_acc:
            curr_best_acc = val_acc
            os.makedirs(args.models_dir, exist_ok=True)
            ckpt_lib.save_checkpoint(
                os.path.join(args.models_dir, f"{exp_name}_checkpoint.pkl"),
                {"epoch": epoch, "params": params, "opt_state": opt_state},
            )
            dump_gt_pred_csv(GT, predY)

        I = np.arange(X_train.shape[0])
        shuffle_rng.shuffle(I)
        X_train, Y_train = X_train[I], Y_train[I]
    sink.close()
    return curr_best_acc


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument('--data_dir', type=str, default="video_data")
    parser.add_argument('--models_dir', type=str, default="models/")
    parser.add_argument('--num_epochs', type=int, default=200)
    parser.add_argument('--batch_size', type=int, default=128)
    parser.add_argument('--learning_rate', type=float, default=1e-4)
    parser.add_argument('--weight_decay', type=float, default=1e-3)
    parser.add_argument('--optimizer', type=str, default="Adam")
    parser.add_argument('--log_step', type=int, default=2)
    parser.add_argument('--use_wandb', action="store_true")
    return parser


if __name__ == "__main__":
    args = build_parser().parse_args()
    print(args, flush=True)
    main(args)
