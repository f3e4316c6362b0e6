#!/bin/bash
# Round-3 batch 14: fallback/cond structure + chunk-walk lane split.
# SERIALIZED — single-client TPU tunnel (CLAUDE.md).
set -u
cd /root/repo
R=benchmarks/results

echo "=== batch14: cond structure + cwalk split ===" >> $R/batch14.log
timeout 5400 python benchmarks/perf_probe.py --isolate \
  lb_s05_fbnc lb_s05_isonc lb_s05_rb1024 lb_s05_cw2 \
  dol_s05_cw2 dol_s05_cw4 dol_s05_cw8 \
  >> $R/batch14.log 2>&1
echo "=== batch14 done ===" >> $R/batch14.log
