#!/bin/bash
# Round-3 batch: adaptive-flattening deep-dive probes, then the full
# run_all suite and the headline bench.  SERIALIZED — the single-client
# TPU tunnel must never see two python processes (CLAUDE.md).
set -u
cd /root/repo
R=benchmarks/results

echo "=== adaptive stage split + sagitta sweeps ===" >> $R/batch10.log
timeout 7200 python benchmarks/perf_probe.py --isolate \
  lb_ad lb_ad_entry lb_ad_intersect lb_ad_gather lb_ad_s05 lb_ad_s10 \
  lb_ad_rb2k dol_ad dol_ad_sw2 dol_ad_s05 dol_ad_s10 >> $R/batch10.log 2>&1

echo "=== run_all 1 2 4 3 5 ===" >> $R/batch10.log
timeout 5400 python benchmarks/run_all.py 1 2 4 3 5 >> $R/batch10.log 2>&1

echo "=== headline bench (BENCH_r03 preview + profile artifact) ===" >> $R/batch10.log
BENCH_PROFILE=benchmarks/results/profile_r3b timeout 2400 python bench.py >> $R/batch10.log 2>&1

echo "=== batch10 done ===" >> $R/batch10.log
