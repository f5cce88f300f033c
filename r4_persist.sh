#!/bin/bash
# Replay artifact persistence loop (rounds 4+).
#
# The sandbox snapshot/restore drops GITIGNORED paths (observed Aug 18:
# a restore at 11:10 UTC kept untracked-but-not-ignored files like
# article_replay_work_r4.log but deleted article_replay_work/ entirely,
# losing the 31k-clip fixture and a finished 200-epoch checkpoint).
# This loop mirrors the expensive-to-recreate replay artifacts into
# r4_persist/ (NOT gitignored, so it survives restores) as single tar
# files.  r4_restore.sh untars them.
#
# Only small state rides along (~tens of MB): models/ (checkpoints,
# stats npz, metrics JSONLs) + sel_indices pickles.  Fixtures are
# deterministic and fingerprint-validated on resume; results_*/ is
# re-inferable from a checkpoint in minutes.  A refreshed tar is only
# installed when its bytes actually changed (end-of-round snapshots
# auto-commit this dir — an unconditional refresh would append a new
# ~80MB non-delta-friendly blob to git history every round).
P=/root/repo/r4_persist
LOG=/root/repo/r4_persist.log
mkdir -p "$P"

# mirror_work <dirname> <tag> <report>: refresh state tar iff content
# changed.  Small resume state only (ADVICE r4/r5): stats npz + metrics
# JSONLs + sel_indices always; GAN best-val checkpoints (~70 MB each)
# only while the replay report is still incomplete — a completed report
# gates every stage by key, so nothing needs the weights afterwards.
# Classifier checkpoints are NEVER mirrored (the reference-config LSTM
# checkpoint is 2.7 GB; classifier stages resume via report keys alone).
mirror_work() {
  local NAME=$1 TAG=$2 W=/root/repo/$1 REPORT=$3
  [ -d "$W/models" ] || return 0
  local TMP="$P/state$TAG.tar.tmp" OUT="$P/state$TAG.tar"
  local WANT_CKPT=1
  [ -f "$REPORT" ] && grep -q '"completed": true' "$REPORT" && WANT_CKPT=0
  # NUL-safe file list.
  if ! (cd /root/repo && {
          find "$NAME/models" -maxdepth 1 -type f \
               \( -name '*.npz' -o -name 'metrics_*.jsonl' \) -print0
          find "$NAME/models" -mindepth 2 -maxdepth 2 -type f \
               -name 'metrics_*.jsonl' -print0
          if [ "$WANT_CKPT" = 1 ]; then
            find "$NAME/models" -maxdepth 1 -type f \
                 -name '*_checkpoint.pkl' ! -size +200M -print0
          fi
          find "$NAME" -maxdepth 2 -name 'sel_indices_*.pkl' -print0
        } | tar --null -T - -cf "$TMP") 2>>"$LOG"; then
    echo "$(date -u +%FT%TZ) tar failed for $NAME (see above)" >>"$LOG"
    rm -f "$TMP"
    return 1
  fi
  if [ -f "$OUT" ] && cmp -s "$TMP" "$OUT"; then
    rm -f "$TMP"            # unchanged — keep the committed blob stable
  else
    mv "$TMP" "$OUT"
  fi
}

while true; do
  mirror_work article_replay_work "" /root/repo/ARTICLE_REPLAY.json
  mirror_work article_replay_work_signal "_signal" /root/repo/ARTICLE_REPLAY_signal.json
  cp /root/repo/ARTICLE_REPLAY.json "$P/ARTICLE_REPLAY.json" 2>>"$LOG" || true
  cp /root/repo/ARTICLE_REPLAY_signal.json "$P/ARTICLE_REPLAY_signal.json" 2>>"$LOG" || true
  sleep 600
done
