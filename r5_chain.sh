#!/bin/bash
# Round-5 TPU chain: train-step MFU record (VERDICT r4 #7), then the
# article-scale DISCRIMINATIVE signal replay (VERDICT r4 next #1/#2/#3):
# finger-signal fixture, both canonical configs at 50 epochs, finger
# trend K=1..5, anomaly controls, reference-config classifier.
# Serialized because the axon tunnel claims the chip per process.
set -x
cd /root/repo
python3 tpu_train_mfu.py > /tmp/train_mfu2.log 2>&1
echo "=== MFU rc=$? ==="
python3 article_replay.py --scale article --signal_fixture --finger_signal \
  --epochs 50 --fingers 1,2,3,4,5 --finger_epochs 50 \
  --anomaly_controls --reference_classifier \
  --work_dir article_replay_work_signal --out ARTICLE_REPLAY_signal.json \
  --skip_raw_smoke --resume > /tmp/replay_signal_r5.log 2>&1
echo "=== REPLAY rc=$? ==="
