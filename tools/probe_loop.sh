#!/bin/bash
# Standing tunnel watcher: probe the axon backend every ~8 min; the moment
# it answers, fire the round-4 measurement work order exactly once.
#   nohup bash tools/probe_loop.sh > /tmp/probe_loop.log 2>&1 &
# The probe subprocess is hard-capped (a dead tunnel HANGS jax.devices(),
# it does not error), and each attempt is logged with a timestamp so the
# outage window is documented.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

while true; do
  echo "[$(date -u +%FT%TZ)] probing axon..."
  if timeout 240 python -u bench.py --probe; then
    echo "[$(date -u +%FT%TZ)] TUNNEL ALIVE — firing tpu_workorder.sh"
    bash tools/tpu_workorder.sh > /tmp/workorder.log 2>&1
    echo "[$(date -u +%FT%TZ)] workorder finished (rc=$?)"
    exit 0
  fi
  echo "[$(date -u +%FT%TZ)] still down"
  sleep 480
done
