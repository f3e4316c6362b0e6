#!/bin/bash
# Round-3 denoiser supplement dataset: all 19 TRAIN_SCENES x 16 cams at a
# fresh seed (100) + a val supplement (seed 101), to be concatenated with
# denoise_data_r3.npz at train time (train --data a.npz,b.npz).  Shard-
# checkpointed per (scene, 9-cam chunk) — resume by re-running.  TPU job:
# serialized with every other tunnel client (CLAUDE.md).
set -u
cd /root/repo
R=benchmarks/results
rm -f /tmp/gen_supp_done

timeout 10800 python -m raytracingdiffusioncurves_tpu.models.train_denoiser \
  gen --out weights/denoise_data_r3c.npz --val-out weights/denoise_val_r3c.npz \
  --cams 16 --seed 100 --backend jax > $R/gen_r3c.log 2>&1

touch /tmp/gen_supp_done
