#!/bin/bash
# Poll the axon tunnel; when jax.devices() answers, run the pending
# round-3 measurement session (scripts/tpu_session.sh) exactly once.
# Logs to /tmp/tpu_watch.log; session outputs land in /tmp/fused_ab.json
# and /tmp/bench_full.json as usual.
set -u
cd "$(dirname "$0")/.."
log=/tmp/tpu_watch.log
: > "$log"
for i in $(seq 1 200); do
  echo "[$(date +%H:%M:%S)] probe $i" >> "$log"
  if timeout 300 python -c "import jax; jax.devices()" >> "$log" 2>&1; then
    echo "[$(date +%H:%M:%S)] TUNNEL UP — running tpu_session.sh" >> "$log"
    bash scripts/tpu_session.sh fused ab_ssg ab_dgcnn bench >> "$log" 2>&1
    echo "[$(date +%H:%M:%S)] session done rc=$?" >> "$log"
    exit 0
  fi
  sleep 240
done
echo "gave up after 200 probes" >> "$log"
exit 1
