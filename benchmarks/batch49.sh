#!/bin/bash
# Round-4 batch 49: knob retune at the slot-geom + covered-chunk state —
# the level count, walk pairings and gather width were all tuned against
# the old remap-based kernel; the cost structure changed.
set -u
cd /root/repo
R=benchmarks/results
echo "=== batch49: knob retune at sg+cover state $(date -u) ===" >> $R/batch49.log
timeout 21600 python benchmarks/perf_probe.py --isolate=3600 \
  dol_s05_sw2_l2 dol_s05_sw2_l3 dol_s05_sw2_l6 dol_s05_lp8 dol_s05_g128 \
  dol_s05_g1024 lb_s05_l1 lb_s05_l3 lb_s05_lp8 lb_s05_cp4 \
  >> $R/batch49.log 2>&1
echo "=== batch49 done ===" >> $R/batch49.log
touch /tmp/batch49_done
