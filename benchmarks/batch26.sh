#!/bin/bash
# Round-3 batch 26: walk-pairing knobs on the RESTORED post-walk-remap
# kernel (batch23 measured cp4 dol 941->819 and cp2 lb 441->415 on the
# in-walk kernel; pairing is orthogonal to the remap choice, so re-measure
# at the shipped defaults).  lp4 = the new _LWALK_PAIR knob (list-walk
# groups per exit check, shipped hardcoded pair=2 since batch17).
set -u
cd /root/repo
R=benchmarks/results
echo "=== batch26: walk pairing on restored-remap kernel ===" >> $R/batch26.log
timeout 10800 python benchmarks/perf_probe.py --isolate \
  dol_s05_cp4 dol_s05_cp8 lb_s05_cp2 lb_s05_lp4 \
  >> $R/batch26.log 2>&1
echo "=== batch26 done ===" >> $R/batch26.log
touch /tmp/batch26_done
