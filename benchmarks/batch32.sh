#!/bin/bash
# Round-3 batch 32: full re-verify at the committed defaults after
# f114889 (dense sw2 auto-pick, _GATHER_REUSE=False) + 4243102 (r3d
# denoiser).  Expected: headline back at ~32.1 (batch25 class, the 38.6
# in batch29 was the since-rejected gather-reuse build), config3 ~440
# (463.1 minus the ~20 ms reuse regression), config4 >= 30 fps, dolphin
# isolate ~740.
set -u
cd /root/repo
R=benchmarks/results
echo "=== batch32: re-verify at committed defaults ===" >> $R/batch32.log
echo "=== headline bench ===" >> $R/batch32.log
timeout 7200 python bench.py >> $R/batch32.log 2>&1
echo "=== run_all config3 (chained) ===" >> $R/batch32.log
timeout 7200 python benchmarks/run_all.py 3 >> $R/batch32.log 2>&1
echo "=== run_all config4 (interactive) ===" >> $R/batch32.log
timeout 7200 python benchmarks/run_all.py 4 >> $R/batch32.log 2>&1
echo "=== dolphin isolate ===" >> $R/batch32.log
timeout 7200 python benchmarks/perf_probe.py --isolate dol_s05_sw2_l4 \
  >> $R/batch32.log 2>&1
echo "=== batch32 done ===" >> $R/batch32.log
touch /tmp/batch32_done
