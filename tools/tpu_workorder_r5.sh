#!/bin/bash
# Round-5 chip measurement backlog — run when the axon tunnel is live.
# Each block is independently time-capped; results are COMMITTED as
# they land (VERDICT r4 weak #7: the workorder must commit what it
# measures).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/workorder_r5.log
say() { echo "$(date +%H:%M:%S) $*" | tee -a "$LOG"; }

say "=== gate-circuit device bench: B=1 latency + B=256 refresh ==="
timeout 1800 python tools/bench_gates.py --device --batch 1 >> "$LOG" 2>&1 \
  && timeout 1800 python tools/bench_gates.py --device --batch 256 >> "$LOG" 2>&1 \
  && git add results/gate_eval.json \
  && git commit -q -m "Gate-circuit device bench: B=1 latency + B=256 refresh" \
  || say "gate bench FAILED"

say "=== serve bench refresh with --sweep (restores crossover data) ==="
timeout 3600 python tools/bench_serve.py --sweep >> "$LOG" 2>&1 \
  && git add results/serve_bench.json \
  && git commit -q -m "Serve bench refresh on chip (with B=4/16/64 crossover sweep)" \
  || say "serve sweep FAILED"

say "=== chip-grade HTTP serving bench (VERDICT r4 #8) ==="
http_ok=1
for sb in 8 16 32; do
  for cl in 8 32; do
    timeout 1800 python tools/bench_http.py --platform '' --lut \
      --serve_batch $sb --clients $cl --requests $((cl*16)) >> "$LOG" 2>&1 \
      || { say "http lut sb=$sb cl=$cl FAILED"; http_ok=0; }
  done
done
# boolean-circuit HTTP serving on the chip (round-5 capability)
timeout 1800 python tools/bench_http.py --platform '' \
  --model TT_FHE_SMALL --nfilter 8 --tfilter 8 --gates dnf \
  --serve_batch 16 --clients 16 --requests 128 >> "$LOG" 2>&1 \
  || { say "http gates FAILED"; http_ok=0; }
git add results/http_bench.json \
  && git commit -q -m "Chip-grade HTTP serving bench: --lut sweep + gate-circuit rows (axon backend labeled)" \
  || say "http commit FAILED (ok=$http_ok)"

say "=== bench.py sanity (full driver line) ==="
timeout 3600 python bench.py >> "$LOG" 2>&1 || say "bench.py FAILED"
say "workorder done"
