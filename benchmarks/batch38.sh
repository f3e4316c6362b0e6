#!/bin/bash
# Round-3 batch 38: precomputed remap tables A/B (_REMAP_PRECOMP, default
# ON — the in-kernel per-(wedge, level) 16-slice id-table build measured
# ~53/139 ms of lady_bug/dolphin in batch33 and is pure prepass data) +
# the headline guard that batch36's timeout ate (also guards the group-lb
# tables and the hit-span default) + official run_all config3 at the new
# defaults.  OFF side (nrp) = the batch36 committed state (lb 407.1).
set -u
cd /root/repo
R=benchmarks/results
echo "=== batch38: remap-precomp A/B + headline guard ===" >> $R/batch38.log
timeout 36000 python benchmarks/perf_probe.py --isolate=9000 \
  h_arch1024_128_hs lb_s05_full lb_s05_nrp dol_s05_def dol_s05_nrp \
  >> $R/batch38.log 2>&1
echo "=== run_all config3 at remap-precomp defaults ===" >> $R/batch38.log
timeout 7200 python benchmarks/run_all.py 3 >> $R/batch38.log 2>&1
echo "=== batch38 done ===" >> $R/batch38.log
touch /tmp/batch38_done
