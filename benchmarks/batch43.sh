#!/bin/bash
# Round-3 batch 43: confirm runs at the bf16-bilateral default —
# headline guard (bench.py protocol) + chained config3.
set -u
cd /root/repo
R=benchmarks/results
echo "=== batch43: headline guard + config3 @ bilateral-bf16 $(date -u) ===" >> $R/batch43.log
timeout 1800 python bench.py >> $R/batch43.log 2>&1
timeout 3600 python benchmarks/run_all.py 3 >> $R/batch43.log 2>&1
echo "=== batch43 done ===" >> $R/batch43.log
touch /tmp/batch43_done
