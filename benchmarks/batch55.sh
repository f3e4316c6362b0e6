#!/bin/bash
# Round-5 batch 55: config3 re-confirm at reverted defaults + cand_levels=1
# re-probe (chunk-cover era) + headline guard.
set -u
cd /root/repo
R=benchmarks/results
echo "=== batch55: post-revert confirms $(date -u) ===" >> $R/batch55.log
timeout 14400 python benchmarks/perf_probe.py --isolate=3600 \
  lb_s05_l1 lb_s05_l2 \
  >> $R/batch55.log 2>&1
echo "--- run_all config3 (reverted defaults) ---" >> $R/batch55.log
timeout 3600 python benchmarks/run_all.py 3 >> $R/batch55.log 2>&1
echo "--- headline guard ---" >> $R/batch55.log
timeout 3600 python bench.py >> $R/batch55.log 2>&1
echo "=== batch55 done ===" >> $R/batch55.log
touch /tmp/batch55_done
