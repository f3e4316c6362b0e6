#!/bin/bash
# Round-3 batch 39: remap-precomp v2 (reoriented (n_lvls*16, Gnp) tables:
# the kernel dot is IDENTICAL to the slices16 path, only the build is
# gone).  batch38 measured v1 (32-row contraction results) at lb 427.4 /
# dol 704.4 vs the 407.1 / 680.9 in-kernel-build controls — the v2 rows
# here are the clean measurement that decides the default.
set -u
cd /root/repo
R=benchmarks/results
echo "=== batch39: remap-precomp v2 ===" >> $R/batch39.log
timeout 21600 python benchmarks/perf_probe.py --isolate=9000 \
  lb_s05_full dol_s05_def \
  >> $R/batch39.log 2>&1
echo "=== batch39 done ===" >> $R/batch39.log
touch /tmp/batch39_done
