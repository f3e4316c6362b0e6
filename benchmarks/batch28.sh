#!/bin/bash
# Round-3 batch 28: pairing combos.  batch26/27 singles on the restored
# kernel: lb lp4 408.2 (-6.4), dol lp4 774.6 (-70), dol cp8 814.8 (-30),
# cp neutral on lb.  Probe whether cp stacks with lp on dolphin and
# whether lp8 beats lp4 on either headliner.
set -u
cd /root/repo
R=benchmarks/results
for i in $(seq 960); do
  [ -f /tmp/batch27_done ] && break
  sleep 30
done
echo "=== batch28: pairing combos ===" >> $R/batch28.log
timeout 10800 python benchmarks/perf_probe.py --isolate \
  dol_s05_cp8_lp4 dol_s05_lp8 lb_s05_lp8 \
  >> $R/batch28.log 2>&1
echo "=== batch28 done ===" >> $R/batch28.log
touch /tmp/batch28_done
