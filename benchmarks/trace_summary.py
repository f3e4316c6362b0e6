"""Summarize a bench.py BENCH_PROFILE device trace (VERDICT r2 #8).

Extracts per-op total device time from the jax.profiler chrome trace and
prints the per-frame device cost of the chained headline run — the
checked-in evidence that the headline protocol measures device execution,
not tunnel round-trips (bench.py:74-111).

Usage: python benchmarks/trace_summary.py benchmarks/results/profile_r3
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import sys


def main(logdir: str, frames_hint: int | None = None):
    paths = glob.glob(f"{logdir}/plugins/profile/*/*.trace.json.gz")
    if not paths:
        raise SystemExit(f"no trace under {logdir}")
    with gzip.open(sorted(paths)[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"] if isinstance(tr, dict) else tr
    tot = collections.Counter()
    cnt = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            tot[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
    rows = []
    kern = next((n for n in tot if n.startswith("trace_sums_flat")), None)
    jit = next((n for n in tot if n.startswith("jit_run_n")), None)
    for n, d in tot.most_common(12):
        rows.append(f"{d / 1e3:10.1f} ms  x{cnt[n]:4d}  {n[:70]}")
    print("\n".join(rows))
    if kern:
        frames = frames_hint or cnt[kern]
        print(f"\nmegakernel: {tot[kern] / 1e3:.1f} ms over {frames} frames "
              f"= {tot[kern] / 1e3 / frames:.2f} ms/frame DEVICE time")
    if jit and kern:
        frames = frames_hint or cnt[kern]
        print(f"full chained jit (incl. post-processing): "
              f"{tot[jit] / 1e3 / frames:.2f} ms/frame")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "benchmarks/results/profile_r3",
         int(sys.argv[2]) if len(sys.argv) > 2 else None)
