#!/bin/bash
# Round-5 batch 57: VMEM-freed dolphin retries + config3 chained re-confirm.
set -u
cd /root/repo
R=benchmarks/results
echo "=== batch57: g1024/l6 retries $(date -u) ===" >> $R/batch57.log
timeout 14400 python benchmarks/perf_probe.py --isolate=3600 \
  dol_s05_g1024 dol_s05_l6 \
  >> $R/batch57.log 2>&1
echo "--- run_all config3 ---" >> $R/batch57.log
timeout 3600 python benchmarks/run_all.py 3 >> $R/batch57.log 2>&1
echo "=== batch57 done ===" >> $R/batch57.log
touch /tmp/batch57_done
