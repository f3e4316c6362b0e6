#!/bin/bash
# Round-4 batch 46: slot-geom design A/B (lady_bug + dolphin) + headline
# guard.  sg ON is the new default; nsg runs the old remap path for the
# attribution.  Each probe in its own process (--isolate): the flag flips
# jit-cached graphs and a Mosaic failure must not poison the batch.
set -u
cd /root/repo
R=benchmarks/results
echo "=== batch46: slot-geom A/B $(date -u) ===" >> $R/batch46.log
timeout 14400 python benchmarks/perf_probe.py --isolate=3600 \
  h_arch1024_128_hs lb_s05_sg lb_s05_nsg dol_s05_sg dol_s05_nsg \
  >> $R/batch46.log 2>&1
echo "=== batch46 done ===" >> $R/batch46.log
touch /tmp/batch46_done
