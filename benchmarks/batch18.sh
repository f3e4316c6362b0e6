#!/bin/bash
# Round-3 batch 18: config3 tail decomposition (denoise/blur share of the
# 459.2 ms chained frame) — c3_post probes were defined but never measured.
set -u
cd /root/repo
R=benchmarks/results
echo "=== batch18: c3 tail decomposition ===" >> $R/batch18.log
timeout 7200 python benchmarks/perf_probe.py --isolate \
  c3_post c3_post_nodn c3_post_noblur \
  >> $R/batch18.log 2>&1
echo "=== batch18 done ===" >> $R/batch18.log
touch /tmp/batch18_done
