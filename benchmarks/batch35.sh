#!/bin/bash
# Round-3 batch 35: (a) remap-table attribution REALITY CHECK — rtb's
# unfoldable broadcast table vs chl's foldable zeros decides whether the
# 53/139 ms "build" share is real relayout cost or folded matmuls;
# (b) gsc mid/wide points (lb 256, dol 1024) around the batch34 winners;
# (c) chl+gspan1 combined ceiling on lb; (d) official run_all config3/4
# confirmation at the new scene-gated gsc defaults.
set -u
cd /root/repo
R=benchmarks/results
echo "=== batch35: remap-table reality check + gsc points ===" >> $R/batch35.log
timeout 21600 python benchmarks/perf_probe.py --isolate \
  lb_s05_rtb dol_s05_rtb lb_s05_g256 dol_s05_g1024 lb_s05_chlg1 \
  >> $R/batch35.log 2>&1
echo "=== run_all config3+4 at committed defaults ===" >> $R/batch35.log
timeout 7200 python benchmarks/run_all.py 3 4 >> $R/batch35.log 2>&1
echo "=== batch35 done ===" >> $R/batch35.log
touch /tmp/batch35_done
