#!/bin/bash
# Poll for the axon tunnel; the moment device discovery answers, fire
# tools/chip_queue.sh once and exit with its status. Bounded by
# MDT_WATCH_MAX_S (default 10h) so it can never outlive a round.
#   nohup bash tools/chip_watch.sh > /tmp/chip_watch.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
DEADLINE=$(( $(date +%s) + ${MDT_WATCH_MAX_S:-36000} ))
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if timeout 120 python -c "import jax; print(jax.devices())" > /tmp/chip_probe.log 2>&1; then
    echo "chip UP at $(date -u): $(tail -1 /tmp/chip_probe.log)"
    bash tools/chip_queue.sh
    exit $?
  fi
  echo "chip still down at $(date -u)"
  sleep "${MDT_WATCH_INTERVAL_S:-480}"
done
echo "watcher deadline reached; chip never answered"
exit 1
