#!/bin/bash
# Round-3 TPU chain: probes + suite + bench, then (once the CPU-side
# training has written its sentinel) the quality study with the new
# weights.  One TPU process at a time (CLAUDE.md tunnel rule).
set -u
cd /root/repo
R=benchmarks/results

bash benchmarks/batch10.sh

# Wait (up to 90 min) for the denoiser training sentinel so the quality
# study's denoise rows use the round-3 UNet.
for i in $(seq 180); do
  [ -f /tmp/train_r3_done ] && break
  sleep 30
done

echo "=== quality_study (round-3 weights) ===" >> $R/quality_r3.log
timeout 7200 python benchmarks/quality_study.py caps blurex lb \
  >> $R/quality_r3.log 2>&1
echo "=== r3 chain done ===" >> $R/quality_r3.log
