#!/bin/bash
# Round-5 batch 58: phase-2 span upper-bound probes (ask #7 evidence) +
# full config refresh at round-5 defaults.
set -u
cd /root/repo
R=benchmarks/results
echo "=== batch58: span bounds + config refresh $(date -u) ===" >> $R/batch58.log
timeout 14400 python benchmarks/perf_probe.py --isolate=3600 \
  lb_s05_gspan1 dol_s05_gspan1 \
  >> $R/batch58.log 2>&1
echo "--- run_all full refresh ---" >> $R/batch58.log
timeout 7200 python benchmarks/run_all.py 3 4 1 2 5 >> $R/batch58.log 2>&1
echo "=== batch58 done ===" >> $R/batch58.log
touch /tmp/batch58_done
