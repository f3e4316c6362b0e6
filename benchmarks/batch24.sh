#!/bin/bash
# Round-3 batch 24: phase-1-under-graze-cond probe (_PHASE1_COND — the GEOM
# gather moves inside the per-wedge cond; Mosaic in-branch-gather risk
# contained by --isolate).  Gated on the batch23 sentinel.
set -u
cd /root/repo
R=benchmarks/results
for i in $(seq 960); do
  [ -f /tmp/batch23_done ] && break
  sleep 30
done
echo "=== batch24: phase-1 cond probe ===" >> $R/batch24.log
timeout 7200 python benchmarks/perf_probe.py --isolate \
  lb_s05_p1c dol_s05_p1c \
  >> $R/batch24.log 2>&1
echo "=== batch24 done ===" >> $R/batch24.log
touch /tmp/batch24_done
