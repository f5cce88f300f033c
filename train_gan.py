#!/usr/bin/env python
"""GAN training entry point — drop-in CLI for the reference train_gan.py.

Same flags, same schedule (D every `epochs_train_disc`-th epoch, val at
half batch, early stop past epoch 100, best-val checkpointing, per-epoch
reshuffle with RandomState(23456)), same on-disk contracts
(`{exp}{pipeline}_preprocess_core.npz`, best/last checkpoints) — but the
training steps are jit-compiled XLA programs running on TPU, with batches
sharded over a device mesh when more than one chip is visible.

Reference: /root/reference/train_gan.py:27-121,375-400.
"""

import argparse
import os
import shutil

import numpy as np

from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils.platform import (
    ensure_platform_from_env,
)

ensure_platform_from_env()

from multimodal_hand_pose_enhancement_for_sign_language_tpu.train import (
    checkpoint as ckpt_lib,
    data as data_lib,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.train.gan import (
    GanConfig,
    GanTrainer,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.train.schedulers import (
    ReduceLROnPlateau,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils.constants import (
    FEATURE_MAP,
)
from multimodal_hand_pose_enhancement_for_sign_language_tpu.utils.metrics import (
    MetricsSink,
)


def main(args):
    feature_in_dim, feature_out_dim = FEATURE_MAP[args.pipeline]
    rng = np.random.RandomState(23456)

    sink = MetricsSink(
        args.exp_name,
        out_dir=args.model_path,
        use_wandb=args.use_wandb,
        config=dict(
            epochs=args.num_epochs,
            batch_size=args.batch_size,
            learning_rate=args.learning_rate,
            model=args.model,
            pipeline=args.pipeline,
            epochs_train_disc=args.epochs_train_disc,
            disc_label_smooth=args.disc_label_smooth,
            data_dir=args.data_dir,
        ),
    )

    data = data_lib.load_data(
        args.data_dir,
        args.pipeline,
        args.model_path,
        args.exp_name,
        rng,
        require_text=args.require_text,
        require_image=args.require_image,
        embeds_type=args.embeds_type,
        base_path=args.base_path,
    )
    train_X, train_Y = data["train_X"], data["train_Y"]
    val_X, val_Y = data["val_X"], data["val_Y"]
    train_feats, val_feats = data["train_feats"], data["val_feats"]
    print(f"===> in/out train {train_X.shape} {train_Y.shape}", flush=True)
    print(f"===> in/out val   {val_X.shape} {val_Y.shape}", flush=True)

    mesh = None
    import jax

    if len(jax.devices()) > 1:
        from multimodal_hand_pose_enhancement_for_sign_language_tpu.parallel import (
            get_mesh,
        )

        mesh = get_mesh()
        print(f"===> data-parallel over mesh {mesh}", flush=True)

    cfg = GanConfig(
        model=args.model,
        pipeline=args.pipeline,
        feature_in_dim=train_X.shape[-1],
        feature_out_dim=feature_out_dim,
        batch_size=args.batch_size,
        learning_rate=args.learning_rate,
        num_epochs=args.num_epochs,
        patience=args.patience,
        epochs_train_disc=args.epochs_train_disc,
        disc_label_smooth=args.disc_label_smooth,
        loss=args.loss,
        require_text=args.require_text,
        require_image=args.require_image,
        effective_gan=args.effective_gan,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        default_size=args.default_size,
        prng_impl=args.prng_impl,
    )
    trainer = GanTrainer(cfg, mesh=mesh)
    state = trainer.init_state()
    if args.epoch_scan:
        # device-resident fast path: stage the dataset in HBM once; only
        # the reference-exact shuffle permutation crosses the host
        # boundary per epoch
        trX, trY, trF = trainer.stage(train_X, train_Y, train_feats)
        vaX, vaY, vaF = trainer.stage(val_X, val_Y, val_feats)
        order = np.arange(len(train_X))
        val_order = np.arange(len(val_X))

        def run_epoch(state, X, Y, F, kind, batch_size):
            if kind == "val":
                return trainer.run_epoch_resident(
                    state, vaX, vaY, vaF, val_order, kind, batch_size
                )
            return trainer.run_epoch_resident(
                state, trX, trY, trF, order, kind, batch_size
            )

    else:
        run_epoch = trainer.run_epoch

    last_checkpoint = None
    if args.use_checkpoint:
        loaded = ckpt_lib.load_checkpoint(
            os.path.join(args.model_path, f"lastCheckpoint_{args.exp_name}.pkl")
        )
        state.update(loaded["state"])
        # checkpoints store PRNG keys as raw key data; rewrap as typed
        state["rng"] = ckpt_lib.ensure_key(state["rng"])
        print(f"===> resumed from epoch {loaded['epoch']}", flush=True)

    g_sched = ReduceLROnPlateau(args.learning_rate)
    d_sched = ReduceLROnPlateau(args.learning_rate)

    curr_best = 1e9
    prev_save_epoch = 0
    last_grad_flow_epoch = -(10**9)
    for epoch in range(args.num_epochs):
        if epoch > 100 and (epoch - prev_save_epoch) > args.patience:
            print(f"early stopping at: {epoch - 1}", flush=True)
            break
        if epoch > 0 and (
            args.epochs_train_disc == 0 or epoch % args.epochs_train_disc == 0
        ):
            state, d_loss = run_epoch(
                state, train_X, train_Y, train_feats, "d", args.batch_size
            )
            print(
                f"Epoch [{epoch}/{args.num_epochs-1}], Tr. Disc. Loss: {d_loss}",
                flush=True,
            )
            sink.log({"epoch": epoch, "loss_train_disc": d_loss})
        else:
            state, g_loss = run_epoch(
                state, train_X, train_Y, train_feats, "g", args.batch_size
            )
            print(
                f"Epoch [{epoch}/{args.num_epochs-1}], Tr. Loss: {g_loss:.4f}, "
                f"Tr. Perplexity: {np.exp(min(g_loss, 700)):5.4f}",
                flush=True,
            )
            sink.log({"epoch": epoch, "loss_train_gen": g_loss})

            _, val_loss = run_epoch(
                state, val_X, val_Y, val_feats, "val", max(args.batch_size // 2, 1)
            )
            print(
                f"Epoch [{epoch}/{args.num_epochs-1}], Val. Loss: {val_loss:.4f}",
                flush=True,
            )
            sink.log({"loss_val_gen": val_loss})
            g_sched.step(val_loss)
            d_sched.step(val_loss)

            if val_loss < curr_best:
                prev_save_epoch = epoch
                curr_best = val_loss
                fname = os.path.join(
                    args.model_path, f"{args.exp_name}_checkpoint.pkl"
                )
                ckpt_lib.save_checkpoint(
                    fname,
                    {
                        "epoch": epoch,
                        "state": state,
                        "config": vars(args),
                    },
                )
                last_checkpoint = fname
                ckpt_lib.save_checkpoint(
                    os.path.join(
                        args.model_path, f"discriminator_{args.exp_name}.pkl"
                    ),
                    {
                        "epoch": epoch,
                        "d_params": state["d_params"],
                        "d_stats": state["d_stats"],
                    },
                )

        if args.log_grad_flow and (epoch - last_grad_flow_epoch) >= args.log_grad_flow:
            last_grad_flow_epoch = epoch
            bs = min(args.batch_size, len(train_X))
            stats = trainer.grad_flow(
                state,
                train_X[:bs],
                train_Y[:bs],
                train_feats[:bs] if train_feats is not None else None,
            )
            worst = max(stats.values(), key=lambda s: s["max"])
            sink.log({"epoch": epoch, "event": "grad_flow", **{
                k: v["ave"] for k, v in stats.items()
            }})
            print(f"grad-flow: max |g| {worst['max']:.3e}", flush=True)

        # per-epoch reshuffle (reference train_gan.py:113-119)
        I = np.arange(len(train_X))
        rng.shuffle(I)
        if args.epoch_scan:
            order = order[I]  # compose permutations; data stays on device
        else:
            train_X, train_Y = train_X[I], train_Y[I]
            if train_feats is not None:
                train_feats = train_feats[I]

    if last_checkpoint:
        shutil.copyfile(
            last_checkpoint,
            os.path.join(args.model_path, f"lastCheckpoint_{args.exp_name}.pkl"),
        )
    sink.close()
    return curr_best


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument('--base_path', type=str, default="./", help='path to the directory where the data files are stored')
    parser.add_argument('--pipeline', type=str, default='arm2wh', help='pipeline specifying which input/output joints to use')
    parser.add_argument('--num_epochs', type=int, default=200, help='number of training epochs')
    parser.add_argument('--batch_size', type=int, default=128, help='batch size for training')
    parser.add_argument('--learning_rate', type=float, default=1e-4, help='learning rate for training G and D')
    parser.add_argument('--require_text', action="store_true", help="use additional text embeddings or not")
    parser.add_argument('--require_image', action="store_true", help="use additional image features or not")
    parser.add_argument('--embeds_type', type=str, default="normal", help='if "normal", use normal text embeds; if "average", use avg text embeds')
    parser.add_argument('--model_path', type=str, default="models/", help='path for saving trained models')
    parser.add_argument('--log_step', type=int, default=25, help='step size for printing log info')
    parser.add_argument('--tag', type=str, default='', help='prefix for naming purposes')
    parser.add_argument('--exp_name', type=str, default='experiment', help='name for the experiment')
    parser.add_argument('--patience', type=int, default=100, help='amount of epochs without loss improvement before termination')
    parser.add_argument('--use_checkpoint', action="store_true", help="use checkpoint from which to start training")
    parser.add_argument('--prng_impl', type=str, default="rbg", choices=["rbg", "threefry2x32"], help="dropout PRNG: 'rbg' uses the TPU hardware RNG (~2x faster train-mode forward), 'threefry2x32' is backend-independent")
    parser.add_argument('--epochs_train_disc', type=int, default=3, help='train the discriminator every epochs_train_disc epochs')
    parser.add_argument('--model', type=str, default="v1", help='model architecture to be used')
    parser.add_argument('--disc_label_smooth', action="store_true", help="if True, use label smoothing for the discriminator")
    parser.add_argument('--data_dir', type=str, default="video_data", help='directory where results should be stored and loaded from')
    parser.add_argument('--loss', type=str, default="L1", help='Loss to optimize the generator over')
    parser.add_argument('--use_wandb', action="store_true", help="log to wandb in addition to local JSONL")
    parser.add_argument('--effective_gan', action="store_true", help="EXTENSION: give the adversarial term a real gradient (the reference detaches it)")
    parser.add_argument('--bf16', action="store_true", help="EXTENSION: run model compute in bfloat16 (params/optimizer stay f32)")
    parser.add_argument('--log_grad_flow', type=int, default=0, help='log per-layer gradient stats every N epochs (0 = off); the wandb.watch analog')
    parser.add_argument('--default_size', type=int, default=256, help='generator embed width (reference default 256)')
    parser.add_argument('--epoch_scan', action="store_true", help="EXTENSION: run each epoch as one XLA program (lax.scan over batches); needs the dataset resident in device memory")
    return parser


if __name__ == "__main__":
    args = build_parser().parse_args()
    print(args, flush=True)
    main(args)
