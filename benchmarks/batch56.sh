#!/bin/bash
# Round-5 batch 56: on-demand per-wedge sgeom DMA (vs batch55 lb 380.25 /
# batch54 dolphin 527.6 at identical flags) + chained config3.
set -u
cd /root/repo
R=benchmarks/results
echo "=== batch56: sgeom wedge-DMA $(date -u) ===" >> $R/batch56.log
timeout 14400 python benchmarks/perf_probe.py --isolate=3600 \
  lb_s05_l2 dol_s05_nbo lb_s05_entry dol_s05_entry \
  >> $R/batch56.log 2>&1
echo "--- run_all config3 ---" >> $R/batch56.log
timeout 3600 python benchmarks/run_all.py 3 >> $R/batch56.log 2>&1
echo "=== batch56 done ===" >> $R/batch56.log
touch /tmp/batch56_done
