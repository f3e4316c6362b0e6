#!/bin/bash
# Round-3 batch 36: hit-lane-only gather spans A/B (exact-output; missed
# rays' FAR-key junk ids no longer stretch the winner-gather chunk span
# across the table) + the fixed unfoldable remap-table probe (rtb v2) +
# a headline no-op guard.  ON side = committed defaults (lb full / dol
# def); OFF side = nhs.
set -u
cd /root/repo
R=benchmarks/results
echo "=== batch36: hit-span A/B + rtb v2 + headline guard ===" >> $R/batch36.log
timeout 21600 python benchmarks/perf_probe.py --isolate \
  lb_s05_full lb_s05_nhs dol_s05_def dol_s05_nhs \
  h_arch1024_128_hs lb_s05_rtb dol_s05_rtb \
  >> $R/batch36.log 2>&1
echo "=== run_all config3+4 with hit-span defaults ===" >> $R/batch36.log
timeout 7200 python benchmarks/run_all.py 3 4 >> $R/batch36.log 2>&1
echo "=== batch36 done ===" >> $R/batch36.log
touch /tmp/batch36_done
