#!/bin/bash
# Round-3 denoiser retraining (CPU-only — the in-process switch inside
# train_denoiser keeps it off the single-client TPU tunnel).
set -u
cd /root/repo
R=benchmarks/results
rm -f /tmp/train_r3_done

timeout 14400 python -m raytracingdiffusioncurves_tpu.models.train_denoiser \
  train --data weights/denoise_data_r3.npz --val weights/denoise_val_r3.npz \
  --arch unet --steps 4000 --out weights/denoiser_r3.msgpack --device cpu \
  > $R/train_r3b.log 2>&1

timeout 1800 python benchmarks/eval_denoiser.py \
  --val weights/denoise_val_r3.npz --weights weights/denoiser_r3.msgpack \
  > $R/eval_r3b.log 2>&1
timeout 1800 python benchmarks/eval_denoiser.py \
  --val weights/denoise_val_r3.npz --weights weights/denoiser.msgpack \
  > $R/eval_r3b_cnn.log 2>&1

touch /tmp/train_r3_done
