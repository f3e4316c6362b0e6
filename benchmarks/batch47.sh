#!/bin/bash
# Round-4 batch 47: slot-geom + covered-chunk A/B (re-run of batch46's sg
# probes, which crashed on a mid-flight working-tree edit) + UNet forward
# design points + the dn-block 2x2 at honest flags.
set -u
cd /root/repo
R=benchmarks/results
echo "=== batch47: sg + chunk-cover A/B, unet points $(date -u) ===" >> $R/batch47.log
timeout 21600 python benchmarks/perf_probe.py --isolate=3600 \
  lb_s05_sg lb_s05_nsg lb_s05_ncc dol_s05_sg dol_s05_nsg dol_s05_ncc \
  unet_s2d unet_dots unet_s4d \
  dn_block dn_block_bf16 dn_block_noexp dn_block_bf16_noexp \
  >> $R/batch47.log 2>&1
echo "=== batch47 done ===" >> $R/batch47.log
touch /tmp/batch47_done
