"""Offline chunk-span statistics for the winner-gather design.

The batch35 ablations (chl 353.0 / gspan1 358.6 / chlg1 348.8 vs the
407 ms default) localize ~50 ms of lady_bug's trace in MULTI-CHUNK gather
spans: each extra gsc-wide chunk the per-wedge winner gather walks costs a
one-hot chunk mask + an MXU pass, twice (phase-1 geom + phase-2 full).
Before restructuring the gather, this script measures — host-side, from
the same candidate tables the kernel consumes — how wide those spans
actually are:

  * per (tile, wedge) cell: the chunk RANGE (i_hi - i_lo + 1 over
    gid >> log2(gsc)) of ALL valid candidate ids — the upper bound the
    hit-lane span can reach;
  * the range of the first 8/32 distance-sorted candidates — where the
    winners almost always live (lists are lower-bound sorted);
  * the cell's MODAL chunk coverage: what fraction of (first-32)
    candidates live in the cell's single most common chunk — bounds the
    win of a per-(tile,wedge) "home chunk" substitution.

Run tunnel-free on CPU (the tables are pure JAX):
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python benchmarks/span_stats.py lady_bug dolphin
"""

import sys

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")
import raytracingdiffusioncurves_tpu as rtdc  # noqa: E402
from raytracingdiffusioncurves_tpu.ops import trace_pallas as tp  # noqa: E402
from raytracingdiffusioncurves_tpu.ops import candidates as cand_mod  # noqa: E402

XMLS = "/root/reference/optixHello/xmls"
SCENES = {
    "lady_bug": (f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 256),
    "dolphin": (f"{XMLS}/DiffusionCurvePack/dolphin.xml", 64),
}


def stats(name):
    path, rpp = SCENES[name]
    scene = rtdc.load_scene(path).with_size(1920, 1088)
    devs = rtdc.build_device_scene(scene, min_subdivisions=2, max_sagitta=0.5)
    config = rtdc.RenderConfig(rays_per_pixel=rpp)
    tabs = tp.build_cand_tables(devs, rtdc.Camera(), config)
    consts_t = np.asarray(tabs[0])  # (T, W, TC_ROWS, L)
    counts = np.asarray(tabs[1])[..., 0]  # (T, W)
    T, W, _, L = consts_t.shape
    gsc = tp._gather_gsc_for(devs.s_pad)
    ids = consts_t[:, :, cand_mod.TC_ID, :].astype(np.int64)  # (T, W, L)
    n = np.minimum(counts, L)  # valid slots (overflow walks chunks too)
    valid = np.arange(L)[None, None, :] < n[:, :, None]
    ch = ids >> int(np.log2(gsc))
    nz = n > 0
    print(f"--- {name}: s_pad={devs.s_pad} gsc={gsc} T={T} W={W} L={L}")
    print(
        f"cells nonzero {nz.mean():.3f}  count p50/p90/max "
        f"{np.percentile(n[nz], 50):.0f}/{np.percentile(n[nz], 90):.0f}"
        f"/{n.max()}  overflow(>L) {(counts > L).mean():.4f}"
    )
    for topk in (8, 32, L):
        v = valid & (np.arange(L)[None, None, :] < topk)
        big = np.where(v, ch, -(2**30))
        small = np.where(v, ch, 2**30)
        rng = np.where(nz, big.max(-1) - small.min(-1) + 1, 0)
        r = rng[nz]
        # modal-chunk coverage among the topk candidates
        hits = v.sum(-1)
        modal = np.zeros_like(hits, dtype=np.float64)
        # bincount per cell over the (small) chunk ids
        nch = devs.s_pad // gsc + 1
        oh = (
            np.where(v, ch, nch)[..., None]
            == np.arange(nch + 1)[None, None, None, :]
        ).sum(2)[..., :nch]
        modal_frac = np.where(
            hits > 0, oh.max(-1) / np.maximum(hits, 1), 1.0
        )
        top2_frac = np.where(
            hits > 0,
            (np.sort(oh, -1)[..., -2:].sum(-1)) / np.maximum(hits, 1),
            1.0,
        )
        print(
            f"first{topk:>4}: span p50/p90/p99/max "
            f"{np.percentile(r, 50):.0f}/{np.percentile(r, 90):.0f}"
            f"/{np.percentile(r, 99):.0f}/{r.max()}  mean {r.mean():.2f}  "
            f"modal-chunk frac p50 {np.percentile(modal_frac[nz], 50):.2f} "
            f"mean {modal_frac[nz].mean():.2f}  top2 mean "
            f"{top2_frac[nz].mean():.2f}"
        )


def union_stats(name):
    """Per-TILE union-table design study: if each tile carried ONE
    lb-sorted local id space (the union of its wedges' capped lists) and
    winners were remapped to LOCAL ids, what would the gather spans be?

    Prints the union size distribution (table memory) and the local-rank
    chunk spans of each wedge's first-8/32 candidates at 128-wide local
    chunks — the direct analogue of the current global-id spans."""
    path, rpp = SCENES[name]
    scene = rtdc.load_scene(path).with_size(1920, 1088)
    devs = rtdc.build_device_scene(scene, min_subdivisions=2, max_sagitta=0.5)
    config = rtdc.RenderConfig(rays_per_pixel=rpp)
    tabs = tp.build_cand_tables(devs, rtdc.Camera(), config)
    consts_t = np.asarray(tabs[0])
    counts = np.asarray(tabs[1])[..., 0]
    lbs = np.asarray(tabs[2]) if len(tabs) > 2 else None
    T, W, _, L = consts_t.shape
    ids = consts_t[:, :, cand_mod.TC_ID, :].astype(np.int64)
    n = np.minimum(counts, L)
    valid = np.arange(L)[None, None, :] < n[:, :, None]
    print(f"--- union[{name}]: T={T} W={W} L={L} s_pad={devs.s_pad}")
    u_sizes = np.zeros(T, dtype=np.int64)
    spans = {8: [], 32: []}
    # subsample tiles for speed (every 4th) — distributions, not totals
    for t in range(0, T, 4):
        idt = np.where(valid[t], ids[t], -1)
        flat = idt[idt >= 0]
        if flat.size == 0:
            continue
        uniq = np.unique(flat)
        # sort the union by min lb across wedges (what the prepass would
        # do); the stored lbs are per-GROUP (slots 0,8,...), so each slot
        # inherits its group's lb — fine for ordering statistics
        if lbs is not None:
            lbt = np.repeat(lbs[t][:, : L // 8], 8, axis=1)  # (W, L)
            lbt = np.where(valid[t], lbt, np.inf)
            minlb = np.full(devs.s_pad, np.inf)
            np.minimum.at(minlb, idt[idt >= 0], lbt[idt >= 0])
            order = uniq[np.argsort(minlb[uniq], kind="stable")]
        else:
            order = uniq
        u_sizes[t] = uniq.size
        rank = np.full(devs.s_pad, -1, dtype=np.int64)
        rank[order] = np.arange(order.size)
        for topk in (8, 32):
            v = valid[t] & (np.arange(L)[None, :] < topk)
            for wdg in range(W):
                sel = rank[ids[t, wdg][v[wdg]]]
                if sel.size:
                    spans[topk].append(sel.max() // 128 - sel.min() // 128 + 1)
    us = u_sizes[u_sizes > 0]
    print(
        f"union size p50/p90/p99/max {np.percentile(us, 50):.0f}/"
        f"{np.percentile(us, 90):.0f}/{np.percentile(us, 99):.0f}/{us.max()}"
        f"  mean {us.mean():.0f}"
    )
    for topk in (8, 32):
        s = np.asarray(spans[topk])
        print(
            f"local first{topk:>3}: span p50/p90/p99/max "
            f"{np.percentile(s, 50):.0f}/{np.percentile(s, 90):.0f}/"
            f"{np.percentile(s, 99):.0f}/{s.max()}  mean {s.mean():.2f}  "
            f"frac==1 {(s == 1).mean():.3f}"
        )


for nm in sys.argv[1:] or ["lady_bug"]:
    if nm.startswith("union:"):
        union_stats(nm.split(":", 1)[1])
    else:
        stats(nm)
