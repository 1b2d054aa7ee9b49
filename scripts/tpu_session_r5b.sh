#!/bin/bash
cd /root/repo
set -x
python scripts/probe_panel_tpu.py 2>&1 | tee /tmp/tpu5b_probe.log
if [ ${PIPESTATUS[0]} -ne 0 ]; then
  export SLAMPP_PALLAS_PANELS=0
  echo "panel probe failed -> einsum panels" | tee -a /tmp/tpu5b_probe.log
fi
python bench.py 2>&1 | tee /tmp/tpu5b_bench.log
SLAMPP_ACCEPT_BACKEND=tpu timeout 7200 python scripts/acceptance.py --rows trees10k --out /tmp/acc_tpu_trees_r5b.md 2>&1 | tee /tmp/tpu5b_trees.log
python scripts/crossover_tpu.py --backend tpu --sizes 10000 2>&1 | tee /tmp/tpu5b_xover10k.log
echo "TPU SESSION B DONE"
