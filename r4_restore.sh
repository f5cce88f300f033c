#!/bin/bash
# Restore article_replay_work/ from r4_persist/ tars after a sandbox
# restore wiped the gitignored work dir (see r4_persist.sh header).
# Safe to run unconditionally: it only fills in what is missing.
P=/root/repo/r4_persist
W=/root/repo/article_replay_work
if [ ! -d "$W/video_data" ] && [ -f "$P/fixture.tar" ]; then
  echo "restoring fixture from $P/fixture.tar"
  tar -C /root/repo -xf "$P/fixture.tar"
fi
if [ ! -d "$W/models" ] && [ -f "$P/state.tar" ]; then
  echo "restoring replay state from $P/state.tar"
  tar -C /root/repo -xf "$P/state.tar"
fi
if [ ! -s /root/repo/ARTICLE_REPLAY.json ] && [ -f "$P/ARTICLE_REPLAY.json" ]; then
  cp "$P/ARTICLE_REPLAY.json" /root/repo/ARTICLE_REPLAY.json
fi
