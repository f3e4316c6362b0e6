#!/bin/bash
# Round-3 batch 22: in-walk winner-id tracking (replaces the post-walk
# hierarchical slot->global remap) measured at the shipped dense defaults,
# then the chained config3 protocol + headline confirmation.  Waits for the
# r3 dataset-regen sentinel so the single-client TPU tunnel never sees two
# clients (CLAUDE.md).
set -u
cd /root/repo
R=benchmarks/results

for i in $(seq 480); do
  [ -f /tmp/gen_r3_done ] && break
  sleep 30
done

echo "=== batch22: in-walk id tracking at shipped defaults ===" >> $R/batch22.log
timeout 10800 python benchmarks/perf_probe.py --isolate \
  lb_s05_full lb_s05_entry lb_s05_intersect lb_s05_gather \
  lb_s05_noremap h_base dol_s05_sw2_l4 \
  >> $R/batch22.log 2>&1

echo "=== run_all config3 (chained protocol) ===" >> $R/batch22.log
timeout 5400 python benchmarks/run_all.py 3 >> $R/batch22.log 2>&1

echo "=== headline bench ===" >> $R/batch22.log
timeout 2400 python bench.py >> $R/batch22.log 2>&1
echo "=== batch22 done ===" >> $R/batch22.log
touch /tmp/batch22_done
