#!/bin/bash
# Round-3 batch 23: paired chunk-walk body A/B (_CWALK_PAIR — exit
# reductions amortized over 2/4 chunks; the walk dominates dolphin-class
# frames).  Gated on the batch22 sentinel (single-client tunnel).
set -u
cd /root/repo
R=benchmarks/results
for i in $(seq 720); do
  [ -f /tmp/batch22_done ] && break
  sleep 30
done
echo "=== batch23: chunk-walk pairing A/B ===" >> $R/batch23.log
timeout 10800 python benchmarks/perf_probe.py --isolate \
  dol_s05_sw2_l4 dol_s05_cp2 dol_s05_cp4 lb_s05_cp2 \
  >> $R/batch23.log 2>&1
echo "=== batch23 done ===" >> $R/batch23.log
touch /tmp/batch23_done
