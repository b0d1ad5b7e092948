#!/bin/bash
# Round-4 TPU work order — run when the axon tunnel revives:
#   nohup bash tools/tpu_workorder.sh > /tmp/workorder.log 2>&1 &
# Each stage is independently timed out so one wedge doesn't eat the window;
# ordered by value-per-minute.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# 0. liveness (cheap)
timeout 240 python -u bench.py --probe || exit 1

# 1. headline + extras live — outer cap must exceed bench.py's own
#    worst-case retry budget (~7000 s) or a flapping tunnel kills it
#    before its guaranteed fallback JSON line
timeout 7200 python -u bench.py > /tmp/wo_bench.json 2>/tmp/wo_bench.err

# 2. flagship serving refresh with merged heads (writes serve_bench.json)
timeout 2400 python -u tools/bench_serve.py > /tmp/wo_serve.log 2>&1

# 3. FHE family incl. the XLA-gather B=1 lever (writes serve_bench_fhe.json)
timeout 1800 python -u tools/bench_serve_fhe.py > /tmp/wo_fhe.log 2>&1

# 4. transpose-tax decomposition (block0 heads)
timeout 1800 python -u tools/exp_lut_layout.py --tax > /tmp/wo_tax.log 2>&1

# 5. chip generalization artifact (64^2, 100 epochs, all 3 milestones)
timeout 5400 python -u tools/train_generalization.py > /tmp/wo_gen.log 2>&1

# 6. HTTP serving smoke on the real chip (round 4: --mode serve);
#    numbers are tunnel-transfer-bound, the point is the path works
timeout 1800 python -u tools/bench_http.py --platform "" --clients 8 \
    --requests 64 > /tmp/wo_http.log 2>&1



# 7. commit what was measured — the workorder must not leave dirty
#    result files behind when the round snapshots (VERDICT r4 #7)
git add results/ 2>/dev/null
git diff --cached --quiet || git commit -m "results: TPU workorder measurement refresh"
echo WORKORDER-DONE
