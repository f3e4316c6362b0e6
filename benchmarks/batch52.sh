#!/bin/bash
# Round-5 batch 52: level-split sg dot A/B (lb + dolphin) + config3 tail
# with the flat-chain denoiser + chained config3/config4 confirms.
set -u
cd /root/repo
R=benchmarks/results
echo "=== batch52: lsplit A/B + flat-dn tail $(date -u) ===" >> $R/batch52.log
timeout 21600 python benchmarks/perf_probe.py --isolate=3600 \
  lb_s05_lsp lb_s05_nlsp dol_s05_lsp dol_s05_nlsp \
  c3_post c3_post_noblur \
  >> $R/batch52.log 2>&1
echo "--- run_all config3 (chained, new denoiser) ---" >> $R/batch52.log
timeout 3600 python benchmarks/run_all.py --configs 3 --frames 8 \
  >> $R/batch52.log 2>&1
echo "=== batch52 done ===" >> $R/batch52.log
touch /tmp/batch52_done
