#!/bin/bash
# Round-3 batch 34: the two batch33-guided optimizations, A/B'd.
# gsc=512 gather chunks are the new default (g128 = round-2 width);
# remap builds fold/tslice8 attack the 53/139 ms slices16 storm.
# fold's reshape may be rejected by Mosaic — isolate mode contains it.
# Baselines for comparison: lb 406.2 (batch31 ngre), dol 740.4.
set -u
cd /root/repo
R=benchmarks/results
echo "=== batch34: gsc-512 gathers + remap builds ===" >> $R/batch34.log
timeout 21600 python benchmarks/perf_probe.py --isolate \
  lb_s05_fold lb_s05_full lb_s05_tsl8 lb_s05_g128 \
  dol_s05_fold dol_s05_sw2_l4 dol_s05_tsl8 dol_s05_g128 \
  >> $R/batch34.log 2>&1
echo "=== batch34 done ===" >> $R/batch34.log
touch /tmp/batch34_done
