#!/bin/bash
# Round-5 batch 59: final confirms after the wedge-coarsened 4K fix.
set -u
cd /root/repo
R=benchmarks/results
echo "=== batch59: final confirms $(date -u) ===" >> $R/batch59.log
timeout 3600 python bench.py >> $R/batch59.log 2>&1
timeout 3600 python benchmarks/run_all.py 5 >> $R/batch59.log 2>&1
timeout 3600 python benchmarks/run_all.py 3 4 >> $R/batch59.log 2>&1
echo "=== batch59 done ===" >> $R/batch59.log
touch /tmp/batch59_done
