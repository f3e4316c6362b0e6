#!/bin/bash
# Round-3 batch 11: multi-LEVEL capped candidate lists A/B at the shipped
# dense defaults (min_sub=2, sagitta=0.5; dolphin adds sw2).  SERIALIZED —
# the single-client TPU tunnel must never see two python processes
# (CLAUDE.md).
set -u
cd /root/repo
R=benchmarks/results

echo "=== cand levels A/B (lb 256rpp, dol 64rpp; s05 defaults) ===" >> $R/batch11.log
timeout 10800 python benchmarks/perf_probe.py --isolate \
  lb_s05_l1 lb_s05_l2 lb_s05_l3 lb_s05_l4 lb_s05_l3_nooffb \
  dol_s05_sw2_l1 dol_s05_sw2_l2 dol_s05_sw2_l3 dol_s05_sw2_l4 \
  dol_s05_sw2_l3_nooffb >> $R/batch11.log 2>&1

echo "=== batch11 done ===" >> $R/batch11.log
