#!/bin/bash
# Restore replay work dirs from r4_persist/ tars after a sandbox restore
# wiped the gitignored work dirs (see r4_persist.sh header).
# Safe to run unconditionally: it only fills in what is missing.
P=/root/repo/r4_persist

restore_work() {
  local NAME=$1 TAG=$2 W=/root/repo/$1
  if [ ! -d "$W/video_data" ] && [ -f "$P/fixture$TAG.tar" ]; then
    echo "restoring $NAME fixture from $P/fixture$TAG.tar"
    tar -C /root/repo -xf "$P/fixture$TAG.tar"
  fi
  if [ ! -d "$W/models" ] && [ -f "$P/state$TAG.tar" ]; then
    echo "restoring $NAME state from $P/state$TAG.tar"
    tar -C /root/repo -xf "$P/state$TAG.tar"
  fi
}

restore_work article_replay_work ""
restore_work article_replay_work_signal "_signal"

if [ ! -s /root/repo/ARTICLE_REPLAY.json ] && [ -f "$P/ARTICLE_REPLAY.json" ]; then
  cp "$P/ARTICLE_REPLAY.json" /root/repo/ARTICLE_REPLAY.json
fi
if [ ! -s /root/repo/ARTICLE_REPLAY_signal.json ] && [ -f "$P/ARTICLE_REPLAY_signal.json" ]; then
  cp "$P/ARTICLE_REPLAY_signal.json" /root/repo/ARTICLE_REPLAY_signal.json
fi
