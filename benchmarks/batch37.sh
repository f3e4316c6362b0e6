#!/bin/bash
# Round-3 batch 37: per-GROUP lb tables (8x less SMEM DMA per program)
# A/B'd against batch36's full/def rows; entry-ablation shares before vs
# after (lb 34.8 / dol unknown); config3 tail decomposition (c3_post has
# never actually been measured); official run_all config3 with the
# group-lb tables + the zero-flow warp skip.
set -u
cd /root/repo
R=benchmarks/results
echo "=== batch37: group-lb SMEM tables + tail decomposition ===" >> $R/batch37.log
timeout 21600 python benchmarks/perf_probe.py --isolate \
  lb_s05_full lb_s05_entry dol_s05_def dol_s05_entry \
  c3_post c3_post_noblur c3_post_nodn \
  >> $R/batch37.log 2>&1
echo "=== run_all config3 at committed defaults ===" >> $R/batch37.log
timeout 7200 python benchmarks/run_all.py 3 >> $R/batch37.log 2>&1
echo "=== batch37 done ===" >> $R/batch37.log
touch /tmp/batch37_done
