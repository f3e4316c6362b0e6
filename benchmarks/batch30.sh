#!/bin/bash
# Round-3 batch 30: wedge granularity on the dense headliners at the
# pairing defaults (cp8/lp4; batch29 re-baseline lb 408.8 / dol 742.8).
# sw2 on lady_bug halves each cell's angular candidate span (sw8 measured
# 656.8, sw4 is the default; sw2 untried); dol sw1 likewise untried.
set -u
cd /root/repo
R=benchmarks/results
for i in $(seq 960); do
  [ -f /tmp/batch29_done ] && break
  sleep 30
done
echo "=== batch30: wedge granularity ===" >> $R/batch30.log
timeout 10800 python benchmarks/perf_probe.py --isolate \
  lb_s05_sw2 dol_s05_sw1 \
  >> $R/batch30.log 2>&1
echo "=== batch30 done ===" >> $R/batch30.log
touch /tmp/batch30_done
