#!/bin/bash
# Run an sbt command in the warm tmux sbt shell and wait for completion.
# Usage: tools/sbtcmd.sh "<sbt command>" [timeout_sec]
set -u
CMD="$1"; TO="${2:-600}"
tmux clear-history -t sbt
tmux send-keys -t sbt "$CMD" Enter
for ((i=0; i<TO/2; i++)); do
  sleep 2
  out=$(tmux capture-pane -t sbt -p -S -20 2>/dev/null)
  if echo "$out" | grep -qE "^\[(success|error)\] Total time"; then
    tmux capture-pane -t sbt -p -S -200 | grep -vE "INFO |WARN " | tail -60
    echo "$out" | grep -qE "^\[success\]" && exit 0 || exit 1
  fi
done
echo "TIMEOUT after ${TO}s"; tmux capture-pane -t sbt -p -S -40 | tail -30; exit 2
