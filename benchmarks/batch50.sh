#!/bin/bash
# Round-4 batch 50: stage ablations at the slot-geom state + block-size /
# dim-semantics retune (the r3 splits predate the sg/cover restructure).
set -u
cd /root/repo
R=benchmarks/results
echo "=== batch50: sg-state stage splits $(date -u) ===" >> $R/batch50.log
timeout 21600 python benchmarks/perf_probe.py --isolate=3600 \
  lb_s05_ab_entry lb_s05_ab_raygen lb_s05_ab_intersect lb_s05_ab_gather \
  lb_s05_ab_shade lb_s05_rb4k lb_s05_dimpar \
  dol_s05_ab_entry dol_s05_ab_intersect dol_s05_ab_gather dol_s05_ab_shade \
  >> $R/batch50.log 2>&1
echo "=== batch50 done ===" >> $R/batch50.log
touch /tmp/batch50_done
