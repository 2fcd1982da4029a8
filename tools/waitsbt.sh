#!/bin/bash
# Wait until the sbt pane shows a new "[success]"/"[error] (Nonzero" terminal line
# after the marker time passed as $1 (HH:MM:SS). Prints the tail when done.
for i in $(seq 1 120); do
  line=$(tmux capture-pane -t base -p | grep -E "\[success\] Total time|Nonzero exit code" | tail -1)
  cur=$(tmux capture-pane -t base -p | tail -1)
  if [[ "$cur" == *"topproduceetlspark"* && -n "$line" ]]; then
    ts=$(echo "$line" | grep -oE '[0-9]+:[0-9]+:[0-9]+ (AM|PM)')
    echo "$line"; exit 0
  fi
  sleep 5
done
echo TIMEOUT; exit 1
