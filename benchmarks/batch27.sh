#!/bin/bash
# Round-3 batch 27: complete the pairing matrix on the restored kernel
# (batch26: dol cp4 820.0 / cp8 814.8 vs 844.9; lb cp2 417.3 ~ neutral).
# lb cp4 checks the dolphin-winning default doesn't regress lady_bug;
# dol lp4 checks the list-walk pairing on the deep-overflow scene.
set -u
cd /root/repo
R=benchmarks/results
for i in $(seq 960); do
  [ -f /tmp/batch26_done ] && break
  sleep 30
done
echo "=== batch27: pairing matrix completion ===" >> $R/batch27.log
timeout 10800 python benchmarks/perf_probe.py --isolate \
  lb_s05_cp4 dol_s05_lp4 \
  >> $R/batch27.log 2>&1
echo "=== batch27 done ===" >> $R/batch27.log
touch /tmp/batch27_done
