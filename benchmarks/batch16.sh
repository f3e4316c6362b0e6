#!/bin/bash
# Round-3 batch 16: two-phase shipped — dolphin + fresh lb stage split +
# end-to-end config3 + headline bench confirmation.  SERIALIZED (CLAUDE.md).
set -u
cd /root/repo
R=benchmarks/results

echo "=== batch16: two-phase default measurements ===" >> $R/batch16.log
timeout 7200 python benchmarks/perf_probe.py --isolate \
  dol_s05_sw2_l4 lb_s05_entry lb_s05_intersect lb_s05_gather \
  >> $R/batch16.log 2>&1

echo "=== run_all config3 ===" >> $R/batch16.log
timeout 3600 python benchmarks/run_all.py 3 >> $R/batch16.log 2>&1

echo "=== headline bench ===" >> $R/batch16.log
timeout 2400 python bench.py >> $R/batch16.log 2>&1
echo "=== batch16 done ===" >> $R/batch16.log
