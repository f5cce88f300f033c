#!/bin/bash
# Round-4 tunnel watcher: wait for the axon tunnel to come back, then run
# the TPU chain serially (single-core host), stopping ALL heavy chip work
# by HEAVY_DEADLINE so the chip is free for bench + the driver's round-end
# bench. Logs to /tmp/r4_chain.log.
cd /root/repo
LOG=/tmp/r4_chain.log
# round ends ~ts 1787037145 (07:12 UTC); heavy work stops 06:30 UTC
HEAVY_DEADLINE=1787034600
probe() {
  timeout 240 python - <<'EOF'
import jax, numpy as np
d = jax.devices()
print(float(np.asarray(jax.numpy.ones((64, 64)).sum())), d, flush=True)
EOF
}
left() { echo $(( HEAVY_DEADLINE - $(date +%s) )); }
echo "$(date -u +%H:%M:%S) watcher start (heavy deadline $(date -u -d @$HEAVY_DEADLINE +%H:%M:%S))" >> "$LOG"
while true; do
  if grep -q "TUNNEL OK" /tmp/tunnel_probe.log 2>/dev/null; then
    echo "$(date -u +%H:%M:%S) probe loop reported OK" >> "$LOG"; break
  fi
  if ! kill -0 "$(cat /tmp/tunnel_probe.pid 2>/dev/null)" 2>/dev/null; then
    if probe >> "$LOG" 2>&1; then
      echo "$(date -u +%H:%M:%S) own probe OK" >> "$LOG"; break
    fi
    echo "$(date -u +%H:%M:%S) still down (own probe)" >> "$LOG"
  fi
  if [ "$(left)" -lt 300 ]; then
    echo "$(date -u +%H:%M:%S) heavy deadline passed with tunnel down; exiting" >> "$LOG"
    exit 1
  fi
  sleep 120
done
sleep 15   # let the successful probe process exit and release the chip

T=$(left)
if [ "$T" -gt 600 ]; then
  echo "$(date -u +%H:%M:%S) === stage 1: article replay resume (cap ${T}s) ===" >> "$LOG"
  timeout "$T" python article_replay.py --scale article \
    --work_dir /tmp/ar_article --out ARTICLE_REPLAY.json --resume \
    --fingers 1,2,3,4,5 --finger_epochs 50 \
    --reference_classifier --reference_classifier_epochs 20 \
    >> "$LOG" 2>&1
  echo "$(date -u +%H:%M:%S) replay rc=$?" >> "$LOG"
fi
T=$(left)
if [ "$T" -gt 300 ]; then
  echo "$(date -u +%H:%M:%S) === stage 2: lift prefetch A/B (cap ${T}s) ===" >> "$LOG"
  timeout $(( T < 2400 ? T : 2400 )) python tpu_lift_prefetch_ab.py 4000 2 >> "$LOG" 2>&1
  echo "$(date -u +%H:%M:%S) ab rc=$?" >> "$LOG"
fi
T=$(left)
if [ "$T" -gt 300 ]; then
  echo "$(date -u +%H:%M:%S) === stage 3: article lifting rerun (cap ${T}s) ===" >> "$LOG"
  timeout $(( T < 2400 ? T : 2400 )) python tpu_article_lifting.py >> "$LOG" 2>&1
  echo "$(date -u +%H:%M:%S) lifting rc=$?" >> "$LOG"
fi
echo "$(date -u +%H:%M:%S) === stage 4: bench sanity ===" >> "$LOG"
timeout 1500 python bench.py >> "$LOG" 2>&1
echo "$(date -u +%H:%M:%S) bench rc=$? === CHAIN DONE ===" >> "$LOG"
