#!/bin/bash
# Tunnel watcher (round-3 postmortem, ROADMAP.md:144-151): probe the TPU
# with a hard timeout in a loop; the moment it answers, fire the round-4
# measurement batch exactly once.  Run me with nohup/background.
set -u
cd "$(dirname "$0")/.."
mkdir -p tpu_runs/r4
echo "watch: probing every 180s (pid $$)" > tpu_runs/r4/watch.log
while true; do
  if timeout 90 python -c "import jax; assert jax.devices()[0].platform == 'tpu'" >/dev/null 2>&1; then
    echo "watch: tunnel UP at $(date -u)" >> tpu_runs/r4/watch.log
    date -u > tpu_runs/r4/TUNNEL_UP
    break
  fi
  echo "watch: down at $(date -u)" >> tpu_runs/r4/watch.log
  sleep 180
done
touch tpu_runs/r4/BATCH_RUNNING
bash tools/tpu_batch_r4.sh >> tpu_runs/r4/watch.log 2>&1
rm -f tpu_runs/r4/BATCH_RUNNING
touch tpu_runs/r4/BATCH_DONE
echo "watch: batch done at $(date -u)" >> tpu_runs/r4/watch.log
