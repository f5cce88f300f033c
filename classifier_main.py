#!/usr/bin/env python
"""LSTM topic-classifier entry point — drop-in CLI for the reference
H2Sclassifier/Train_Test/main.py: r6d sequences -> 10-way topic logits,
CE on the last timestep, best-val-accuracy checkpointing + GT/pred CSV.
"""

import argparse
import os

import numpy as np

from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils.platform import (
    ensure_platform_from_env,
)

ensure_platform_from_env()

import jax  # noqa: E402

from multimodal_hand_pose_enhancement_for_sign_language_tpu.models.classifier import (  # noqa: E402
    ClassifLSTM,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.train import (  # noqa: E402
    checkpoint as ckpt_lib,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.train.classifier import (  # noqa: E402
    ClassifierTrainer,
    dump_gt_pred_csv,
    load_data,
    should_remat,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils.metrics import (  # noqa: E402
    MetricsSink,
)


def main(args):
    exp_name = (
        f"{args.data_dir.split('/')[-1]}__{args.num_epochs}__{args.batch_size}"
        f"__{args.learning_rate}__{args.hidden_size}__{args.num_layers}"
        f"__bidir{args.bidir}__{args.weight_decay}__{args.dropout}__{args.optimizer}"
    )
    args.exp_name = exp_name
    sink = MetricsSink(exp_name, out_dir=args.models_dir, use_wandb=args.use_wandb)

    X_train, Y_train = load_data(args.data_dir, args.data_type, "train")
    X_val, Y_val = load_data(args.data_dir, args.data_type, "val")
    print(f"X_train {X_train.shape}, X_val {X_val.shape}", flush=True)

    if args.remat:
        remat = True
    elif args.no_remat:
        remat = False
    else:
        # auto: remat when the saved-activation footprint would OOM the
        # device (the reference-default config needs ~27 GB on a 16 GB
        # chip); exactness is test-covered, so auto-enabling only trades
        # recompute FLOPs for fitting in HBM
        remat = should_remat(
            args.batch_size,
            X_train.shape[1] if X_train.ndim == 3 else 192,
            args.hidden_size,
            args.num_layers,
            args.bidir,
        )
        if remat:
            print(
                "===> auto-enabling LSTM remat (estimated activation "
                "footprint exceeds device memory; pass --no_remat to "
                "override)",
                flush=True,
            )

    module = ClassifLSTM(
        hidden_size=args.hidden_size,
        num_layers=args.num_layers,
        num_classes=10,
        bidirectional=args.bidir,
        dropout=args.dropout,
        remat=remat,
    )
    trainer = ClassifierTrainer(
        module,
        learning_rate=args.learning_rate,
        weight_decay=args.weight_decay,
        optimizer=args.optimizer,
    )
    rng = jax.random.PRNGKey(1)  # torch.manual_seed(1), hyperparameters.py:10
    params, opt_state = trainer.init_state(rng, X_train[: min(2, len(X_train))])
    shuffle_rng = np.random.RandomState(23456)  # main.py:75

    if args.epoch_scan:
        # device-resident fast path: the dataset is uploaded once; only
        # the shuffle permutation crosses the host boundary per epoch
        dX, dY = trainer.stage(X_train, Y_train)
        vX, vY = trainer.stage(X_val, Y_val)
        order = np.arange(X_train.shape[0])

    curr_best_acc = 0.0
    rng_key = jax.random.PRNGKey(2)
    for epoch in range(args.num_epochs):
        if args.epoch_scan:
            params, opt_state, tr_losses, tr_acc, rng_key = (
                trainer.train_epoch_resident(
                    params, opt_state, dX, dY, order, args.batch_size, rng_key
                )
            )
            val_loss, val_acc, (GT, predY) = trainer.val_epoch_resident(
                params, vX, vY, args.batch_size
            )
        else:
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
            print(
                f"Epoch {epoch}: Tr. acc={tr_acc:.4f} Val. acc={val_acc:.4f} "
                f"Val. loss={val_loss:.4f}",
                flush=True,
            )
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
        if args.epoch_scan:
            order = order[I]  # compose permutations; data stays on device
        else:
            X_train, Y_train = X_train[I], Y_train[I]
    sink.close()
    return curr_best_acc


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument('--data_dir', type=str, default="video_data", help='directory with r6d/categs pickles')
    parser.add_argument('--categs_dir', type=str, default="video_data", help='directory with category pickles')
    parser.add_argument('--data_type', type=str, default="r6d", help='"r6d", "grouped_r6d", "wordBert", ...')
    parser.add_argument('--models_dir', type=str, default="models/", help='checkpoint directory')
    parser.add_argument('--exp_name', type=str, default='experiment', help='experiment name')
    parser.add_argument('--num_epochs', type=int, default=200)
    parser.add_argument('--batch_size', type=int, default=128)
    parser.add_argument('--learning_rate', type=float, default=1e-4)
    parser.add_argument('--hidden_size', type=int, default=1024)
    parser.add_argument('--num_layers', type=int, default=10)
    parser.add_argument('--bidir', type=str, default="False")
    parser.add_argument('--weight_decay', type=float, default=1e-3)
    parser.add_argument('--dropout', type=float, default=0.1)
    parser.add_argument('--optimizer', type=str, default="Adam", help='Adam | AdamW | NAdam')
    parser.add_argument('--remat', action="store_true",
                        help='force LSTM layer rematerialization in backward '
                             '(fits large batches in HBM; exact).  Default is '
                             'AUTO: remat is enabled when the estimated '
                             'activation footprint exceeds device memory')
    parser.add_argument('--no_remat', action="store_true",
                        help='disable the automatic remat policy')
    parser.add_argument('--epoch_scan', action="store_true",
                        help='EXTENSION: stage the dataset in device memory '
                             'once and feed steps batch-index vectors only '
                             '(removes per-step host->device transfers)')
    parser.add_argument('--log_step', type=int, default=2)
    parser.add_argument('--use_wandb', action="store_true")
    return parser


if __name__ == "__main__":
    args = build_parser().parse_args()
    args.bidir = args.bidir in ("True", "T", "true")
    print(args, flush=True)
    main(args)
