#!/bin/bash
# Canonical finger-masking experiment sweep (reference
# launch_exp_incr_fingers.sh): model v2 with text conditioning over
# arm_wh2finger{1..10}, train + inference per config.  Runs on whatever
# accelerator jax sees (one TPU chip or a mesh); no SLURM needed.

set -e

for i in $(seq 1 10); do
  for embeds_type in normal average; do
    exp="${embeds_type}Embed_modv2_arm_wh2finger${i}"
    python train_gan.py \
      --model_path models/ --batch_size 256 --num_epochs 350 --patience 1000 \
      --require_text --embeds_type "$embeds_type" --exp_name "$exp" \
      --learning_rate 0.001 --epochs_train_disc 3 --model v2 \
      --pipeline "arm_wh2finger${i}" "$@"
    for infer_set in train test; do
      python inference.py \
        --checkpoint "models/lastCheckpoint_${exp}.pkl" \
        --seqs_to_viz 25 --num_samples 1000 --require_text \
        --embeds_type "$embeds_type" --infer_set "$infer_set" \
        --exp_name "$exp" --model v2 --pipeline "arm_wh2finger${i}"
    done
  done
done
