#!/bin/bash
# Round-3 batch 42: denoiser-block design points — bf16 bilateral tap math
# A/B + the exp-chain timing ablation, at config3 resolution with the
# shipped r3d weights.  No trace kernel involved (seconds to compile).
set -u
cd /root/repo
R=benchmarks/results
echo "=== batch42: dn_block bilateral probes $(date -u) ===" >> $R/batch42.log
timeout 3600 python benchmarks/perf_probe.py --isolate \
  dn_block dn_block_bf16 dn_block_noexp \
  >> $R/batch42.log 2>&1
echo "=== batch42 done ===" >> $R/batch42.log
touch /tmp/batch42_done
