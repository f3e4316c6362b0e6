#!/bin/bash
# Round-3 batch 29: re-verify the shipped protocols at the new pairing
# defaults (_CWALK_PAIR=8, _LWALK_PAIR=4; batch26-28 probes).  Expected:
# lb isolate ~408, dol isolate ~744, config3 chained < 470.3, headline
# unchanged (~32.1 — arch is slot-mode, pairing paths don't run).
set -u
cd /root/repo
R=benchmarks/results
for i in $(seq 960); do
  [ -f /tmp/batch28_done ] && break
  sleep 30
done
echo "=== batch29: re-verify at pairing defaults cp8/lp4 ===" >> $R/batch29.log
timeout 7200 python benchmarks/perf_probe.py --isolate \
  lb_s05_full dol_s05_sw2_l4 \
  >> $R/batch29.log 2>&1
echo "=== run_all config3 (chained protocol) ===" >> $R/batch29.log
timeout 5400 python benchmarks/run_all.py 3 >> $R/batch29.log 2>&1
echo "=== headline bench ===" >> $R/batch29.log
timeout 1800 python bench.py >> $R/batch29.log 2>&1
echo "=== batch29 done ===" >> $R/batch29.log
touch /tmp/batch29_done
