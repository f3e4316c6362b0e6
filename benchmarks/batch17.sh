#!/bin/bash
# Round-3 batch 17: sweep micro-opts (shared packed key, paired walk exits,
# one-pass remap matmul) measured at the shipped defaults, then the chained
# config3 protocol + headline confirmation.  Waits for the dataset-gen
# sentinel so the single-client TPU tunnel never sees two clients
# (CLAUDE.md).
set -u
cd /root/repo
R=benchmarks/results

for i in $(seq 360); do
  [ -f /tmp/gen_supp_done ] && break
  sleep 30
done

echo "=== batch17: micro-opt A/B at shipped defaults ===" >> $R/batch17.log
timeout 10800 python benchmarks/perf_probe.py --isolate \
  lb_s05_full lb_s05_entry lb_s05_intersect lb_s05_gather \
  h_base dol_s05_sw2_l4 \
  >> $R/batch17.log 2>&1

echo "=== run_all config3 (chained protocol) ===" >> $R/batch17.log
timeout 5400 python benchmarks/run_all.py 3 >> $R/batch17.log 2>&1

echo "=== headline bench ===" >> $R/batch17.log
timeout 2400 python bench.py >> $R/batch17.log 2>&1
echo "=== batch17 done ===" >> $R/batch17.log
touch /tmp/batch17_done
