#!/bin/bash
# Round-3 batch 15: two-phase final-winner gather — measure the new default
# (lb_s05_full / dol_s05_sw2_l4 / h_base pick up _TWO_PHASE=True) vs the
# old split path (tp0).  SERIALIZED — single-client TPU tunnel (CLAUDE.md).
set -u
cd /root/repo
R=benchmarks/results

echo "=== batch15: two-phase gather A/B ===" >> $R/batch15.log
timeout 7200 python benchmarks/perf_probe.py --isolate \
  lb_s05_full dol_s05_sw2_l4 h_base lb_s05_tp0 dol_s05_tp0 \
  >> $R/batch15.log 2>&1
echo "=== batch15 done ===" >> $R/batch15.log
