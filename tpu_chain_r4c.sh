#!/bin/bash
# Round-4 chain, part c: the SIGNAL-fixture classifier surrogate run.
#
# The completed ARTICLE_REPLAY.json classifier accuracies sit at chance
# by construction (the default synthetic fixture's categoryID labels are
# independent of the pose streams — data/synthetic.py).  This chain runs
# the same article-scale surrogate eval on the signal-bearing fixture
# (make_r6d_dataset categ_signal=True: per-class angular signature +
# text class centroids) so GT-vs-enhanced accuracy measures actual
# discriminative learning — the article §5.2 comparison with signal in
# the data.  Only config-1 (arm2wh_v1_L1) trains: the classifier stage
# consumes its results; 50 epochs (vs 200) since the comparison, not
# Table-1 absolute L1, is the target.
#
# Same v3 discipline as tpu_chain_r4b.sh: never probe the tunnel (a
# killed claimer leaves a ~30 min stale lease); each stage IS the
# claimer, watched by a log-mtime watchdog.
cd /root/repo || exit 1
# own log: the stall watchdog keys on LOG mtime, so sharing a log with a
# concurrently running sibling chain would keep mtime fresh and defeat
# stall detection (r4 code review)
LOG=/root/repo/article_replay_work_r4c.log
PIDFILE=/root/repo/.r4c_chain.pid
STALL_S=2400

if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
  echo "$(date -u +%H:%M:%S) r4c chain already running (pid $(cat "$PIDFILE")); exiting" >> "$LOG"
  exit 0
fi
# never run concurrently with the r4b chain: both claim the single TPU
# terminal and one would block in the claim-retry loop
if [ -f /root/repo/.r4_chain.pid ] && kill -0 "$(cat /root/repo/.r4_chain.pid)" 2>/dev/null; then
  echo "$(date -u +%H:%M:%S) r4b chain still running; exiting" >> "$LOG"
  exit 0
fi
echo $$ > "$PIDFILE"

# Sandbox restores drop gitignored artifacts; refill from r4_persist/
# tars and keep mirroring while we run (see r4_persist.sh header).
bash /root/repo/r4_restore.sh >> "$LOG" 2>&1
if ! { [ -f /tmp/r4_persist.pid ] && kill -0 "$(cat /tmp/r4_persist.pid)" 2>/dev/null; }; then
  nohup bash /root/repo/r4_persist.sh > /root/repo/r4_persist.log 2>&1 &
  echo $! > /tmp/r4_persist.pid
fi

HEAVY_DEADLINE=${HEAVY_DEADLINE:-$(( $(date +%s) + 21600 ))}   # default now+6h
left() { echo $(( HEAVY_DEADLINE - $(date +%s) )); }

run_watched() {
  local CAP=$1 LABEL=$2; shift 2
  echo "$(date -u +%H:%M:%S) === $LABEL (cap ${CAP}s) ===" >> "$LOG"
  timeout "$CAP" "$@" >> "$LOG" 2>&1 &
  local RPID=$!
  while kill -0 "$RPID" 2>/dev/null; do
    sleep 60
    local AGE=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    if [ "$AGE" -gt "$STALL_S" ]; then
      echo "$(date -u +%H:%M:%S) $LABEL stalled ${AGE}s; killing" >> "$LOG"
      kill "$RPID" 2>/dev/null; sleep 10; kill -9 "$RPID" 2>/dev/null
      break
    fi
  done
  wait "$RPID"; local RC=$?
  echo "$(date -u +%H:%M:%S) $LABEL rc=$RC" >> "$LOG"
  return $RC
}

echo "$(date -u +%H:%M:%S) chain r4c start (pid $$, heavy deadline $(date -u -d @$HEAVY_DEADLINE +%H:%M:%S))" >> "$LOG"

# --- stage 1: signal-fixture replay (config-1 + classifier stages) ---
ATTEMPT=0
while [ "$(left)" -gt 900 ]; do
  ATTEMPT=$(( ATTEMPT + 1 ))
  T=$(left); CAP=$(( T < 14400 ? T : 14400 ))
  if run_watched "$CAP" "r4c-signal-replay-attempt$ATTEMPT" \
      python article_replay.py --scale article --epochs 50 \
      --work_dir /root/repo/article_replay_work_signal \
      --out ARTICLE_REPLAY_signal.json --resume \
      --signal_fixture --skip_raw_smoke --configs arm2wh_v1_L1; then
    break
  fi
  sleep 60
done

# --- stage 2: article lifting rerun at the new default prefetch depth 3 ---
if [ "$(left)" -gt 600 ]; then
  T=$(left); run_watched $(( T < 3000 ? T : 3000 )) "r4c-lifting-prefetch3" \
    env MHPE_LIFT_RUN_KEY=r4_prefetch3 python tpu_article_lifting.py
fi

# --- stage 3: bench sanity ---
run_watched 1800 "r4c-bench" python bench.py
echo "$(date -u +%H:%M:%S) === R4C CHAIN DONE ===" >> "$LOG"
rm -f "$PIDFILE"
