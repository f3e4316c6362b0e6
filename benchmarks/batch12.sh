#!/bin/bash
# Round-3 batch 12: full suite + headline preview with auto-level capped
# lists (levels=2 lady_bug-class / 4 dolphin-class).  SERIALIZED — single-
# client TPU tunnel (CLAUDE.md).
set -u
cd /root/repo
R=benchmarks/results

echo "=== run_all 1 2 4 3 5 (auto cand levels) ===" >> $R/batch12.log
timeout 5400 python benchmarks/run_all.py 1 2 4 3 5 >> $R/batch12.log 2>&1

echo "=== dolphin suite row (auto levels) ===" >> $R/batch12.log
timeout 3600 python benchmarks/perf_probe.py --isolate dol_s05_sw2_l4 \
  >> $R/batch12.log 2>&1

echo "=== headline bench preview ===" >> $R/batch12.log
timeout 2400 python bench.py >> $R/batch12.log 2>&1

echo "=== batch12 done ===" >> $R/batch12.log
