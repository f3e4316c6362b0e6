#!/bin/bash
# Round-3 denoiser +1 dB push, session 2: 10k-step UNet retrain on the
# DOUBLED dataset (r3 regen seed 0 + r3c supplement seed 100, both at the
# current 19-scene TRAIN_SCENES incl. dolphin + lady_bug1024).  CPU-only and
# TUNNEL-FREE (PALLAS_AXON_POOL_IPS unset -> sitecustomize never registers
# axon, CLAUDE.md), so it runs CONCURRENTLY with TPU batches.  Waits for the
# r3 regen sentinel.
set -u
cd /root/repo
R=benchmarks/results

for i in $(seq 480); do
  [ -f /tmp/gen_r3_done ] && break
  sleep 30
done
[ -f weights/denoise_data_r3.npz ] || { echo "no r3 data" > $R/train_r3d.log; exit 1; }
[ -f weights/denoise_data_r3c.npz ] || { echo "no r3c data" > $R/train_r3d.log; exit 1; }

# combined held-out val: r3 regen (16 ex) + r3c supplement (16 ex)
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python - <<'PY' > $R/train_r3d.log 2>&1
import numpy as np
a = dict(np.load("weights/denoise_val_r3.npz"))
b = dict(np.load("weights/denoise_val_r3c.npz"))
np.savez_compressed("weights/denoise_val_r3all.npz",
                    **{k: np.concatenate([a[k], b[k]]) for k in a})
print("val concat:", {k: np.concatenate([a[k], b[k]]).shape for k in a})
PY

env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu timeout 28800 \
  python -m raytracingdiffusioncurves_tpu.models.train_denoiser train \
  --data weights/denoise_data_r3.npz,weights/denoise_data_r3c.npz \
  --val weights/denoise_val_r3all.npz \
  --arch unet --steps 12000 --out weights/denoiser_r3d.msgpack \
  --device cpu >> $R/train_r3d.log 2>&1

for v in weights/denoise_val_r3.npz weights/denoise_val_r3c.npz weights/denoise_val_r3all.npz; do
  for w in weights/denoiser_r3d.msgpack weights/denoiser_r3_s10k.msgpack; do
    echo "=== $w on $v ===" >> $R/eval_r3d.log
    env -u PALLAS_AXON_POOL_IPS timeout 1800 python benchmarks/eval_denoiser.py \
      --val $v --weights $w >> $R/eval_r3d.log 2>&1
  done
done
touch /tmp/train_r3d_done
