#!/bin/bash
# Round-4 batch 48: committed-defaults confirms at the slot-geom state
# (headline guard + chained config3 + config4) + the TPU viewer-fps
# end-to-end measurement + the gradient128Denoise truth decomposition.
set -u
cd /root/repo
R=benchmarks/results
echo "=== batch48: confirms + viewer fps + gradient study $(date -u) ===" >> $R/batch48.log
timeout 1800 python bench.py >> $R/batch48.log 2>&1
timeout 5400 python benchmarks/run_all.py 3 >> $R/batch48.log 2>&1
timeout 3600 python benchmarks/run_all.py 4 >> $R/batch48.log 2>&1
timeout 3600 python benchmarks/viewer_fps.py --frames 120 \
  >> $R/viewer_fps_r4.log 2>&1
timeout 7200 python benchmarks/gradient_denoise_study.py \
  >> $R/gradient_denoise_r4.log 2>&1
echo "=== batch48 done ===" >> $R/batch48.log
touch /tmp/batch48_done
