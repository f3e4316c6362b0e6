#!/bin/bash
# Round-5 batch 51: Pallas fused-conv A/B on the real packed UNet forward.
set -u
cd /root/repo
R=benchmarks/results
echo "=== batch51: pallas conv v2 A/B $(date -u) ===" >> $R/batch51.log
timeout 14400 python benchmarks/perf_probe.py --isolate=3600 \
  up_xla up_nb2 up_nb1 up_nb2_b13 \
  >> $R/batch51.log 2>&1
echo "=== batch51 done ===" >> $R/batch51.log
touch /tmp/batch51_done
