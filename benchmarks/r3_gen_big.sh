#!/bin/bash
# Round-3 denoiser +1 dB push: 3x dataset (19 scenes incl. dolphin +
# lady_bug1024, 45 cams/scene, rpp levels 4-64).  TPU renders — SERIALIZED
# with every other TPU job (single-client tunnel, CLAUDE.md).  The val set
# is REGENERATED with the same protocol as r3 (same scenes/cams/seed) so
# eval rows stay comparable; rpp levels now cycle 5 values.
set -u
cd /root/repo
R=benchmarks/results
rm -f /tmp/gen_big_done

timeout 14400 python -m raytracingdiffusioncurves_tpu.models.train_denoiser \
  gen --out weights/denoise_data_r3b.npz --val-out weights/denoise_val_r3b.npz \
  --cams 45 --seed 0 --backend jax > $R/gen_r3b.log 2>&1

touch /tmp/gen_big_done
