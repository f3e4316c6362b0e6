#!/bin/bash
# Round-3 batch 33: config3 tail decomposition via timing-only ablations
# (waits for batch32).  chl = remap id-table build share; gspan1 = gather
# chunk-span share.  These pick the next optimization target between
# (a) streaming a precomputed remap table, (b) restructuring the gather
# loop, (c) the deferred batched tail mega-refactor.
set -u
cd /root/repo
R=benchmarks/results
for i in $(seq 960); do
  [ -f /tmp/batch32_done ] && break
  sleep 30
done
echo "=== batch33: tail decomposition ablations ===" >> $R/batch33.log
timeout 14400 python benchmarks/perf_probe.py --isolate \
  lb_s05_chl lb_s05_gspan1 dol_s05_chl dol_s05_gspan1 \
  >> $R/batch33.log 2>&1
echo "=== batch33 done ===" >> $R/batch33.log
touch /tmp/batch33_done
