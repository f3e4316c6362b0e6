#!/bin/bash
# Round-3 batch 25: re-baseline the RESTORED post-walk remap kernel (the
# in-walk / post-walk-resolve replacements both measured worse — see
# ARCHITECTURE.md) on the dense headliners, then re-verify the chained
# protocols.  Gated on the batch24 sentinel (single-client tunnel).
set -u
cd /root/repo
R=benchmarks/results
for i in $(seq 960); do
  [ -f /tmp/batch24_done ] && break
  sleep 30
done
echo "=== batch25: restored-remap re-baseline ===" >> $R/batch25.log
timeout 7200 python benchmarks/perf_probe.py --isolate \
  lb_s05_full dol_s05_sw2_l4 \
  >> $R/batch25.log 2>&1
echo "=== run_all config3 (chained protocol) ===" >> $R/batch25.log
timeout 5400 python benchmarks/run_all.py 3 >> $R/batch25.log 2>&1
echo "=== headline bench ===" >> $R/batch25.log
timeout 1800 python bench.py >> $R/batch25.log 2>&1
echo "=== batch25 done ===" >> $R/batch25.log
touch /tmp/batch25_done
