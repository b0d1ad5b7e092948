#!/bin/bash
# Trimmed round-4 work order for a ~1h window with the tunnel live.
# Stages ordered by verdict value; each capped so the whole run ends
# well before the driver's end-of-round bench (serialized compiler!).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# 1. flagship serving refresh with merged heads (writes serve_bench.json)
timeout 1500 python -u tools/bench_serve.py > /tmp/wo_serve.log 2>&1
echo "stage-serve rc=$?"

# 2. FHE family incl. the XLA-gather B=1 lever (writes serve_bench_fhe.json)
timeout 1200 python -u tools/bench_serve_fhe.py > /tmp/wo_fhe.log 2>&1
echo "stage-fhe rc=$?"

# 3. transpose-tax decomposition (block0 heads)
timeout 1000 python -u tools/exp_lut_layout.py --tax > /tmp/wo_tax.log 2>&1
echo "stage-tax rc=$?"

# 4. HTTP serving smoke on the real chip
timeout 500 python -u tools/bench_http.py --platform "" --clients 8 \
    --requests 64 > /tmp/wo_http.log 2>&1
echo "stage-http rc=$?"

echo WORKORDER-TRIM-DONE
