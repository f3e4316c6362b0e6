#!/bin/bash
# Round-3 batch 19: block-size re-probe at the post-batch17 operating point
# (lady_bug 415 ms trace, entry 34.8 ms — fewer/bigger programs may now win).
# Gated on the batch18 sentinel so the single-client tunnel stays serial.
set -u
cd /root/repo
R=benchmarks/results
for i in $(seq 480); do
  [ -f /tmp/batch18_done ] && break
  sleep 30
done
echo "=== batch19: block-size re-probe ===" >> $R/batch19.log
timeout 10800 python benchmarks/perf_probe.py --isolate \
  lb_s05_rb4k lb_s05_rb8k dol_s05_rb4k \
  >> $R/batch19.log 2>&1
echo "=== batch19 done ===" >> $R/batch19.log
touch /tmp/batch19_done
