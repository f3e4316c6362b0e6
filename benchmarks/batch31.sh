#!/bin/bash
# Round-3 batch 31: factored multi-chunk gather one-hot A/B.  The per-chunk
# (128, R) i32 compare + bf16 select pair becomes one bf16 broadcast
# multiply against a loop-invariant low-7-bit one-hot (_GATHER_REUSE=True
# default); ngre = the round-2 fresh build.  lb gathers ~2 gathers x few
# chunk steps per wedge; dolphin's 11.5k-seg table spans 90 chunks.
set -u
cd /root/repo
R=benchmarks/results
for i in $(seq 960); do
  [ -f /tmp/batch30_done ] && break
  sleep 30
done
echo "=== batch31: factored gather one-hot A/B ===" >> $R/batch31.log
timeout 10800 python benchmarks/perf_probe.py --isolate \
  lb_s05_full lb_s05_ngre dol_s05_sw2_l4 dol_s05_ngre \
  >> $R/batch31.log 2>&1
echo "=== batch31 done ===" >> $R/batch31.log
touch /tmp/batch31_done
