#!/bin/bash
# Round-5 batch 54: band-only sweep A/B (lb + dolphin) + chained config3
# confirm + dispatch/viewer attribution runs.
set -u
cd /root/repo
R=benchmarks/results
echo "=== batch54: band-only A/B $(date -u) ===" >> $R/batch54.log
timeout 21600 python benchmarks/perf_probe.py --isolate=3600 \
  lb_s05_bo lb_s05_nbo dol_s05_bo dol_s05_nbo \
  >> $R/batch54.log 2>&1
echo "--- run_all config3 chained (band-only defaults) ---" >> $R/batch54.log
timeout 3600 python benchmarks/run_all.py 3 >> $R/batch54.log 2>&1
echo "--- dispatch probe ---" >> $R/batch54.log
timeout 3600 python benchmarks/dispatch_probe.py >> $R/batch54.log 2>&1
echo "--- viewer fps (TPU) ---" >> $R/batch54.log
timeout 3600 python benchmarks/viewer_fps.py --frames 40 >> $R/batch54.log 2>&1
echo "=== batch54 done ===" >> $R/batch54.log
touch /tmp/batch54_done
