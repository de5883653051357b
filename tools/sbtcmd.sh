#!/bin/bash
# Run an sbt command in the warm tmux sbt shell and wait for completion.
# Usage: tools/sbtcmd.sh "<sbt command>" [timeout_sec]
set -u
CMD="$1"; TO="${2:-600}"
M="DONE_$RANDOM$RANDOM"
# wait until sbt prompt is idle (no command running)
for ((i=0; i<TO/2; i++)); do
  last=$(tmux capture-pane -t sbt -p | grep -vE '^\s*$' | tail -1)
  [[ "$last" == *"sbt:etlpipelineorchestrationspark"* ]] && break
  sleep 2
done
tmux clear-history -t sbt
tmux send-keys -t sbt "$CMD ; eval println(\"$M\" + \"_END\")" Enter
for ((i=0; i<TO/2; i++)); do
  sleep 2
  if tmux capture-pane -t sbt -p -J -S -5000 | grep -q "${M}_END"; then
    out=$(tmux capture-pane -t sbt -p -J -S -5000 | grep -vE "INFO |WARN ")
    echo "$out" | tail -80
    echo "$out" | grep -qE "^\[error\] Total time|\*\*\* .* FAILED" && exit 1 || exit 0
  fi
done
echo "TIMEOUT after ${TO}s"; exit 2
