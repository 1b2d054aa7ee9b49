#!/bin/bash
# Round-5 TPU session: sequential single-client workloads (tunnel-safe).
cd /root/repo
set -x
python scripts/probe_panel_tpu.py 2>&1 | tee /tmp/tpu5_probe.log
if [ ${PIPESTATUS[0]} -ne 0 ]; then
  export SLAMPP_PALLAS_PANELS=0
  echo "panel probe failed -> einsum panels for the rest" | tee -a /tmp/tpu5_probe.log
fi
python bench.py 2>&1 | tee /tmp/tpu5_bench.log
python scripts/venice_real_tpu.py 2>&1 | tee /tmp/tpu5_venice.log
SLAMPP_ACCEPT_BACKEND=tpu timeout 14400 python scripts/acceptance.py --out docs/ACCEPTANCE_TPU_cold_r5.md 2>&1 | tee /tmp/tpu5_acc_cold.log
SLAMPP_ACCEPT_BACKEND=tpu timeout 14400 python scripts/acceptance.py --out docs/ACCEPTANCE_TPU_warm_r5.md 2>&1 | tee /tmp/tpu5_acc_warm.log
python scripts/crossover_tpu.py --backend tpu --sizes 3500,10000,30000 2>&1 | tee /tmp/tpu5_xover.log
echo "TPU SESSION DONE"
