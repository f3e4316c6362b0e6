"""TPU perf probe: time trace configs + stage ablations in ONE process.

The TPU sits behind a single-client tunnel and kernel compiles take minutes,
so experiments are batched here and run in the background (CLAUDE.md).  Each
line of output is one JSON record.

Usage:  python benchmarks/perf_probe.py [probe names...]
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import raytracingdiffusioncurves_tpu as rtdc
from raytracingdiffusioncurves_tpu.ops import trace_pallas
from raytracingdiffusioncurves_tpu.utils import compile_cache

compile_cache.enable()

XMLS = "/root/reference/optixHello/xmls"


def time_trace(path, w, h, rpp, frames=10, ablate=None, label="", no_cand=False,
               rays_per_block=None, exact_ablate=None, hoist=False,
               wedge_samples=None, cheap=False, bisect_iters=None,
               dim_semantics=None, walk_split=None, wedge_cap=None,
               scene_horizon=None, ablate_remap=None, ablate_offb=None,
               remap_mxu=None, min_sub=None, sagitta=None, cand_levels=None,
               cwalk_split=None, two_phase=None, remap_pair=None,
               cwalk_pair=None, phase1_cond=None, lwalk_pair=None,
               gather_reuse=None, ablate_remap_table=None, gspan1=None,
               remap_build=None, gather_gsc=None, gather_hit_span=None,
               remap_precomp=None, gather_outmask=None, slotgeom=None,
               chunk_cover=None, sg_lsplit=None, band_only=None):
    from raytracingdiffusioncurves_tpu.ops import candidates as cand_mod
    from raytracingdiffusioncurves_tpu.ops import refine

    if dim_semantics is not None:
        trace_pallas._DIM_SEMANTICS = dim_semantics
    trace_pallas._ABLATE_STAGE = ablate
    trace_pallas._DISABLE_CAND = no_cand
    trace_pallas._EXACT_ABLATE = exact_ablate
    ws_saved = trace_pallas.WEDGE_SAMPLES_MULTICHUNK
    bi_saved = refine.BISECT_ITERS
    wc_saved = cand_mod.CAND_MAX_WEDGES
    cp_saved = trace_pallas._CWALK_PAIR
    lp_saved = trace_pallas._LWALK_PAIR
    gr_saved = trace_pallas._GATHER_REUSE
    if bisect_iters is not None:
        refine.BISECT_ITERS = bisect_iters
    if wedge_samples is not None:
        trace_pallas.WEDGE_SAMPLES_MULTICHUNK = wedge_samples
    if walk_split is not None:
        trace_pallas._WALK_SPLIT = walk_split
    if cwalk_split is not None:
        trace_pallas._CWALK_SPLIT = cwalk_split
    if cwalk_pair is not None:
        trace_pallas._CWALK_PAIR = cwalk_pair
    if lwalk_pair is not None:
        trace_pallas._LWALK_PAIR = lwalk_pair
    if gather_reuse is not None:
        trace_pallas._GATHER_REUSE = gather_reuse
    if gather_outmask is not None:
        trace_pallas._GATHER_OUTMASK = gather_outmask
    if ablate_remap_table is not None:
        trace_pallas._ABLATE_REMAP_TABLE = ablate_remap_table
    if gspan1 is not None:
        trace_pallas._ABLATE_GATHER_SPAN1 = gspan1
    if gather_hit_span is not None:
        trace_pallas._GATHER_HIT_SPAN = gather_hit_span
    if remap_precomp is not None:
        trace_pallas._REMAP_PRECOMP = remap_precomp
    if remap_build is not None:
        trace_pallas._REMAP_BUILD = remap_build
    if gather_gsc is not None:
        # force EXACTLY this width on multi-chunk scenes: zero the wide-min
        # gate too (the default gate demotes mid-size tables to 128)
        trace_pallas._GATHER_GSC = gather_gsc
        trace_pallas._GATHER_WIDE_MIN = 0
    if phase1_cond is not None:
        trace_pallas._PHASE1_COND = phase1_cond
    if two_phase is not None:
        trace_pallas._TWO_PHASE = two_phase
    if remap_mxu is not None:
        trace_pallas._REMAP_MXU = remap_mxu
    if remap_pair is not None:
        trace_pallas._REMAP_PAIR = remap_pair
    if wedge_cap is not None:
        cand_mod.CAND_MAX_WEDGES = wedge_cap
    if scene_horizon is not None:
        trace_pallas._SCENE_HORIZON = scene_horizon
    if ablate_remap is not None:
        trace_pallas._ABLATE_REMAP = ablate_remap
    if ablate_offb is not None:
        trace_pallas._ABLATE_OVERFLOW_FB = ablate_offb
    cl_saved = trace_pallas._CAND_LEVELS
    if cand_levels is not None:
        trace_pallas._CAND_LEVELS = cand_levels
        trace_pallas.build_cand_tables.clear_cache()
    cc_saved = trace_pallas._CHUNK_COVER
    if chunk_cover is not None:
        trace_pallas._CHUNK_COVER = chunk_cover
        trace_pallas.build_cand_tables.clear_cache()
    if sg_lsplit is not None:
        trace_pallas._SG_LEVEL_SPLIT = sg_lsplit
    if band_only is not None:
        trace_pallas._BAND_ONLY = band_only
    sgm_saved = trace_pallas._SLOTGEOM
    if slotgeom is not None:
        # the flag changes build_cand_tables' output TUPLE LENGTH and the
        # kernel graph — both jit caches key on shapes/static args only
        trace_pallas._SLOTGEOM = slotgeom
        trace_pallas.build_cand_tables.clear_cache()
    try:
        scene = rtdc.load_scene(path)
        scene = scene.with_size(w, h)
        dev = rtdc.build_device_scene(
            scene,
            **({"min_subdivisions": min_sub} if min_sub else {}),
            **({"max_sagitta": sagitta} if sagitta else {}),
        )
        kw = {"rays_per_block": rays_per_block} if rays_per_block else {}
        config = rtdc.RenderConfig(
            rays_per_pixel=rpp, use_aa=True, use_blur=False, use_denoiser=False, **kw
        )

        # _ABLATE_STAGE is a module global: bypass trace_sums_flat's jit cache
        # (static args don't include the global) by jitting the unwrapped fn.
        inner = trace_pallas.trace_sums_flat.__wrapped__

        # ``hoist``: prebuild the camera-dependent accel tables ONCE (the
        # production static-camera protocol, bench.py) so ablations measure
        # the kernel alone, not the fused per-frame prepass.
        tables = None
        gl = None
        if hoist:
            tables = trace_pallas.build_cand_tables(
                dev, rtdc.Camera(1.0, 0.0, 0.0), config
            )
            gl = trace_pallas.seg_max_count(dev, tables)
            if gl is not None:
                tables = trace_pallas.narrow_cand_tables(tables, gl)

        # The tunneled TPU costs ~40-50 ms per dispatched call, so K frames
        # run inside ONE jit (sequential via the loop carry) — per-frame
        # time then reflects device execution, not tunnel round-trips.
        # tables ride as jit ARGUMENTS: closure-captured device arrays are
        # baked into the HLO as constants, and the round-3 slot tables are
        # large enough to blow the remote-compile request limit (HTTP 413).
        @jax.jit
        def run_n(off, n, tabs):
            def body(i, s):
                c, ws, b = inner(
                    dev, rtdc.Camera(1.0, off + s * 0.0, 0.0), config, i, 0, w * h,
                    cand_tables=tabs, gather_len=gl, cheap_prepass=cheap,
                )
                return jnp.sum(c) + jnp.sum(ws) + jnp.sum(b)

            # dynamic trip count: one compilation for any frame count
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        t0 = time.perf_counter()
        float(run_n(jnp.float32(0.0), 1, tables))
        comp = time.perf_counter() - t0
        t1 = time.perf_counter()
        float(run_n(jnp.float32(0.0), 1, tables))
        sync_ms = (time.perf_counter() - t1) * 1000  # 1 frame + 1 dispatch
        t0 = time.perf_counter()
        float(run_n(jnp.float32(0.0), frames, tables))
        total = time.perf_counter() - t0  # 1 dispatch + `frames` frames
        ms = total * 1000 / frames
        print(
            json.dumps(
                {
                    "label": label,
                    "ms": round(ms, 2),
                    "sync_ms": round(sync_ms, 2),
                    "compile_s": round(comp, 1),
                    "ablate": ablate,
                    "no_cand": no_cand,
                    "hoist": hoist,
                    "rays_per_s": round(w * h * rpp / ms * 1000.0),
                }
            ),
            flush=True,
        )
        return ms
    except Exception as e:  # keep the batch going; record the failure
        r = repr(e)
        if len(r) > 4000:  # keep the TAIL too — Mosaic puts the real
            r = r[:1500] + " ...[cut]... " + r[-2500:]  # error last
        print(json.dumps({"label": label, "error": r}), flush=True)
        return None
    finally:
        trace_pallas._ABLATE_STAGE = None
        trace_pallas._DISABLE_CAND = False
        trace_pallas._EXACT_ABLATE = None
        trace_pallas.WEDGE_SAMPLES_MULTICHUNK = ws_saved
        refine.BISECT_ITERS = bi_saved
        trace_pallas._DIM_SEMANTICS = "arbitrary"
        trace_pallas._WALK_SPLIT = 1
        trace_pallas._CWALK_SPLIT = 1
        trace_pallas._CWALK_PAIR = cp_saved
        trace_pallas._LWALK_PAIR = lp_saved
        trace_pallas._GATHER_REUSE = gr_saved
        trace_pallas._ABLATE_REMAP_TABLE = False
        trace_pallas._ABLATE_GATHER_SPAN1 = False
        trace_pallas._GATHER_HIT_SPAN = True
        trace_pallas._REMAP_BUILD = "slices16"
        trace_pallas._GATHER_GSC = 512
        trace_pallas._GATHER_WIDE_MIN = 4096
        trace_pallas._PHASE1_COND = False
        trace_pallas._TWO_PHASE = True
        trace_pallas._REMAP_MXU = False
        trace_pallas._REMAP_PAIR = True
        cand_mod.CAND_MAX_WEDGES = wc_saved
        trace_pallas._SCENE_HORIZON = True
        trace_pallas._ABLATE_REMAP = False
        trace_pallas._ABLATE_OVERFLOW_FB = False
        if cand_levels is not None:
            trace_pallas._CAND_LEVELS = cl_saved
            trace_pallas.build_cand_tables.clear_cache()
        if slotgeom is not None:
            trace_pallas._SLOTGEOM = sgm_saved
            trace_pallas.build_cand_tables.clear_cache()
        if chunk_cover is not None:
            trace_pallas._CHUNK_COVER = cc_saved
            trace_pallas.build_cand_tables.clear_cache()


def time_prepass(path, w, h, rpp, frames=50, label=""):
    """Time the candidate-list prepass alone (it runs per frame under the
    frame jit; the trace kernel's 'entry' ablation includes it)."""
    from raytracingdiffusioncurves_tpu.ops import candidates as cand_mod

    scene = rtdc.load_scene(path)
    scene = scene.with_size(w, h)
    dev = rtdc.build_device_scene(scene)
    config = rtdc.RenderConfig(rays_per_pixel=rpp, use_aa=True)
    R, pxb, sw, n_wedges = trace_pallas._choose_block(
        rpp, config.rays_per_block,
        multi_chunk=dev.s_pad > trace_pallas.SEG_CHUNK,
    )
    tile_h = pxb // trace_pallas.TILE_W
    tiles_x = -(-w // trace_pallas.TILE_W)
    tiles_y = -(-h // tile_h)

    @jax.jit
    def run_n(zoom, n):
        def body(i, s):
            c, counts = cand_mod.segment_candidates(
                dev.seg_consts, w, h, zoom + s * 0.0, 0.0, 0.0, rpp, sw,
                tiles_x, tiles_y, trace_pallas.TILE_W, tile_h, 0, True,
                cand_len=min(dev.s_pad, trace_pallas.SEG_CHUNK),
            )
            return jnp.sum(c) + jnp.sum(counts).astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(run_n(jnp.float32(1.0), 1))
    t0 = time.perf_counter()
    float(run_n(jnp.float32(1.0), frames))
    ms = (time.perf_counter() - t0) * 1000 / frames
    print(json.dumps({"label": label, "ms": round(ms, 2)}), flush=True)


def time_postprocess(w, h, frames=30, label="", denoise=True, blur=True,
                     blur_zero=True):
    """Time the denoise+blur tail alone at (w, h) — the non-trace share of
    the interactive frame (config4)."""
    from raytracingdiffusioncurves_tpu.models import renderer

    scene = rtdc.load_scene(f"{XMLS}/arch.xml").with_size(w, h)
    dev = rtdc.build_device_scene(scene)
    config = rtdc.RenderConfig(
        rays_per_pixel=8, use_blur=blur, use_denoiser=denoise
    )
    state = rtdc.init_frame_state(w, h)

    @jax.jit
    def run_n(img0, bmap, n):
        def body(i, carry):
            img, prev = carry
            out, nxt = renderer._postprocess(
                img + i * 0.0, bmap, state._replace(prev_image=prev),
                config, dev, None, None,
            )
            return out, nxt

        return jax.lax.fori_loop(0, n, body, (img0, img0))

    img0 = jnp.zeros((h, w, 4), jnp.float32) + 0.5
    bmap = jnp.zeros((h, w), jnp.float32) + (0.0 if blur_zero else 1.5)
    out, _ = run_n(img0, bmap, 1)
    float(out[0, 0, 0])
    t0 = time.perf_counter()
    out, _ = run_n(img0, bmap, frames)
    float(out[0, 0, 0])
    ms = (time.perf_counter() - t0) * 1000 / frames
    print(json.dumps({"label": label, "ms": round(ms, 2)}), flush=True)
    return ms


def time_post_c3(frames=20, label="c3_post", denoiser=True, blur=True):
    """Time config3's REAL denoise+blur tail (lady_bug 1080p, shipped UNet
    weights, the scene's real blur map) — the non-trace share of the
    516.7 ms run_all frame (batch16)."""
    import glob

    from raytracingdiffusioncurves_tpu.models import denoiser as dn
    from raytracingdiffusioncurves_tpu.models import renderer

    scene = rtdc.load_scene(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml"
    ).with_size(1920, 1088)
    dev = rtdc.build_device_scene(scene, min_subdivisions=2, max_sagitta=0.5)
    config = rtdc.RenderConfig(
        rays_per_pixel=256, use_blur=blur, use_denoiser=denoiser
    )
    img, bmap = rtdc.trace_image(dev, rtdc.Camera(), config, backend="pallas")
    dnp = None
    if denoiser:
        cands = sorted(glob.glob("weights/denoiser*.msgpack"),
                       key=lambda p: -os.path.getmtime(p))
        dnp = dn.load_params(cands[0]) if cands else None
    state = rtdc.init_frame_state(1920, 1088)

    @jax.jit
    def run_n(img0, bm, n):
        def body(i, carry):
            im, prev = carry
            out, nxt = renderer._postprocess(
                im + i * 0.0, bm, state._replace(prev_image=prev),
                config, dev, None, dnp,
            )
            return out, nxt

        return jax.lax.fori_loop(0, n, body, (img0, img0))

    img4 = jnp.concatenate(
        [img[..., :3], jnp.ones(img.shape[:2] + (1,), jnp.float32)], axis=-1
    ) if img.shape[-1] == 3 else img
    out, _ = run_n(img4, bmap, 1)
    float(out[0, 0, 0])
    t0 = time.perf_counter()
    out, _ = run_n(img4, bmap, frames)
    float(out[0, 0, 0])
    ms = (time.perf_counter() - t0) * 1000 / frames
    print(json.dumps({"label": label, "ms": round(ms, 2)}), flush=True)
    return ms


def time_unet_variants(which="asis", label="unet", h=1088, w=1920):
    """Shape-level timing of UNet-inference design points at config3's
    resolution (random weights — conv wall time depends only on shapes).

    asis: the shipped UNetDenoiser(base=24) bf16 forward (~30 ms of the
    459.2 ms chained config3 frame, batch18 c3_post decomposition).
    s2d:  space-to-depth packed equivalent COST model — all spatial dims
    halved, channels x4, 3x3 kernels (a strict FLOP superset of the exact
    phase-split transform, 4x the FLOPs at 4x the MXU lane utilization).
    f32:  the same net with f32 convs (is bf16 actually buying anything?).
    half: UNet run at half resolution (a retrain-needed design point)."""
    from flax import linen as nn

    from raytracingdiffusioncurves_tpu.models import denoiser as dn

    bf = jnp.bfloat16

    class PackedNet(nn.Module):
        base: int = 96  # 4 x 24

        @nn.compact
        def __call__(self, x):
            c = self.base

            def conv(x, ch, name, stride=1):
                return nn.relu(nn.Conv(ch, (3, 3), (stride, stride),
                                       padding="SAME", dtype=bf, name=name)(x))

            e0 = conv(conv(x, c, "enc0a"), c, "enc0b")
            e1 = conv(conv(e0, 2 * c, "enc1a", stride=2), 2 * c, "enc1b")
            e2 = conv(conv(e1, 4 * c, "enc2a", stride=2), 4 * c, "enc2b")

            def up(x, like):
                n, hh, ww, _ = like.shape
                return jax.image.resize(x, (n, hh, ww, x.shape[-1]), "nearest")

            d1 = conv(jnp.concatenate([up(e2, e1), e1], -1), 2 * c, "dec1")
            d0 = conv(jnp.concatenate([up(d1, e0), e0], -1), c, "dec0")
            return nn.Conv(12, (3, 3), padding="SAME", dtype=bf, name="out")(d0)

    class DotsNet(nn.Module):
        """PackedNet topology with every conv lowered to 9 shifted bf16
        dot_generals (accumulated in f32) instead of conv_general_dilated
        — probes whether XLA's TPU conv lowering leaves matmul-path time
        on the table at these channel counts."""

        base: int = 96

        @nn.compact
        def __call__(self, x):
            c = self.base

            def conv(x, ch, name, stride=1, act=True):
                cin = x.shape[-1]
                k = self.param(
                    name + "_k",
                    nn.initializers.lecun_normal(),
                    (3, 3, cin, ch), bf,
                )
                b = self.param(name + "_b", nn.initializers.zeros, (ch,),
                               bf)
                n, hh, ww, _ = x.shape
                xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
                acc = jnp.zeros(
                    (n, (hh + stride - 1) // stride,
                     (ww + stride - 1) // stride, ch), jnp.float32,
                )
                for du in range(3):
                    for dv in range(3):
                        sl = xp[:, du : du + hh : stride,
                                dv : dv + ww : stride, :]
                        acc = acc + jax.lax.dot_general(
                            sl.astype(bf), k[du, dv],
                            (((3,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                y = (acc + b.astype(jnp.float32)).astype(bf)
                return nn.relu(y) if act else y

            e0 = conv(conv(x, c, "enc0a"), c, "enc0b")
            e1 = conv(conv(e0, 2 * c, "enc1a", stride=2), 2 * c, "enc1b")
            e2 = conv(conv(e1, 4 * c, "enc2a", stride=2), 4 * c, "enc2b")

            def up(x, like):
                n, hh, ww, _ = like.shape
                return jax.image.resize(x, (n, hh, ww, x.shape[-1]),
                                        "nearest")

            d1 = conv(jnp.concatenate([up(e2, e1), e1], -1), 2 * c, "dec1")
            d0 = conv(jnp.concatenate([up(d1, e0), e0], -1), c, "dec0")
            return conv(d0, 12, "out", act=False)

    key = jax.random.PRNGKey(0)
    if which == "s2d":
        x = jnp.zeros((1, h // 2, w // 2, 44), jnp.float32)
        model = PackedNet()
        params = model.init(key, x)
        fn = jax.jit(lambda p, v: model.apply(p, v))
        args = (params, x)
    elif which == "dots":
        x = jnp.zeros((1, h // 2, w // 2, 44), jnp.float32)
        model = DotsNet()
        params = model.init(key, x)
        fn = jax.jit(lambda p, v: model.apply(p, v))
        args = (params, x)
    elif which == "s4d":
        # 4x4 space-to-depth COST MODEL: full-res layers at quarter
        # spatial, 16x channels, 3x3 kernels — a strict FLOP superset of
        # the exact phase-split transform (16x nominal FLOPs at full MXU
        # lane utilization: 384+ channels = 3 lane tiles).
        x = jnp.zeros((1, h // 4, w // 4, 176), jnp.float32)
        model = PackedNet(base=384)
        params = model.init(key, x)
        fn = jax.jit(lambda p, v: model.apply(p, v))
        args = (params, x)
    elif which == "half":
        z3 = jnp.zeros((1, h // 2, w // 2, 3), jnp.float32)
        z2 = jnp.zeros((1, h // 2, w // 2, 2), jnp.float32)
        model = dn.UNetDenoiser()
        params = model.init(key, z3, z3, z2)
        fn = jax.jit(lambda p, a, b, c: model.apply(p, a, b, c))
        args = (params, z3, z3, z2)
    else:  # asis / f32
        z3 = jnp.zeros((1, h, w, 3), jnp.float32)
        z2 = jnp.zeros((1, h, w, 2), jnp.float32)
        model = dn.UNetDenoiser()
        params = model.init(key, z3, z3, z2)
        if which == "f32":
            fp = jnp.float32

            class F32Wrap(nn.Module):
                """UNetDenoiser topology with f32 convs."""

                @nn.compact
                def __call__(self, a, b, c):
                    base = 24

                    def conv(x, ch, name, stride=1):
                        return nn.relu(nn.Conv(
                            ch, (3, 3), (stride, stride), padding="SAME",
                            dtype=fp, name=name,
                        )(x))

                    analytic = jax.vmap(dn.analytic_baseline)(a, b)
                    x = jnp.concatenate([a, b, analytic, c], -1)
                    e0 = conv(conv(x, base, "enc0a"), base, "enc0b")
                    e1 = conv(conv(e0, 2 * base, "enc1a", stride=2),
                              2 * base, "enc1b")
                    e2 = conv(conv(e1, 4 * base, "enc2a", stride=2),
                              4 * base, "enc2b")

                    def up(x, like):
                        n, hh, ww, _ = like.shape
                        return jax.image.resize(
                            x, (n, hh, ww, x.shape[-1]), "nearest")

                    d1 = conv(jnp.concatenate([up(e2, e1), e1], -1),
                              2 * base, "dec1")
                    d0 = conv(jnp.concatenate([up(d1, e0), e0], -1),
                              base, "dec0")
                    out = nn.Conv(3, (3, 3), padding="SAME", dtype=fp,
                                  name="out")(d0)
                    return analytic + out

            model = F32Wrap()
            params = model.init(key, z3, z3, z2)
        fn = jax.jit(lambda p, a, b, c: model.apply(p, a, b, c))
        args = (params, z3, z3, z2)

    out = fn(*args)
    float(out[0, 0, 0, 0])  # sync warmup through the tunnel
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        out = fn(*args)
    float(out[0, 0, 0, 0])
    ms = (time.perf_counter() - t0) * 1000 / n
    print(json.dumps({"label": label, "ms": round(ms, 2)}), flush=True)
    return ms


def time_unet_pallas(label="unet_pallas", h=1088, w=1920, pallas=True,
                     nbuf=None, budget=None):
    """The REAL packed UNet forward (shipped r3d weights, analytic pass
    included) at 1080p, with the Pallas fused conv on/off — the round-5
    A/B for ops/conv_pallas.py's column-folded schedule (VERDICT r4 #2).
    ``nbuf``: DMA buffer slots (2 = double-buffered); ``budget``: VMEM
    budget override for the row-block-height pick."""
    from raytracingdiffusioncurves_tpu.models import denoiser as dn
    from raytracingdiffusioncurves_tpu.ops import conv_pallas

    params = dn.load_params("weights/denoiser_r3d.msgpack")
    saved = (dn.PALLAS_CONV, conv_pallas._NBUF, conv_pallas._VMEM_BUDGET)
    dn.PALLAS_CONV = pallas
    if nbuf is not None:
        conv_pallas._NBUF = nbuf
    if budget is not None:
        conv_pallas._VMEM_BUDGET = budget
    try:
        z3 = jnp.zeros((1, h, w, 3), jnp.float32)
        z2 = jnp.zeros((1, h, w, 2), jnp.float32)
        apply = dn.apply_unet_flat if pallas else dn.apply_unet_packed
        fn = jax.jit(lambda a, b, c: apply(params, a, b, c))
        out = fn(z3, z3, z2)
        float(out[0, 0, 0, 0])
        t0 = time.perf_counter()
        n = 20
        for _ in range(n):
            out = fn(z3, z3, z2)
        float(out[0, 0, 0, 0])
        ms = (time.perf_counter() - t0) * 1000 / n
        print(json.dumps({"label": label, "ms": round(ms, 2)}), flush=True)
        return ms
    finally:
        dn.PALLAS_CONV, conv_pallas._NBUF, conv_pallas._VMEM_BUDGET = saved


def time_dn_block(frames=30, label="dn_block", bil_bf16=None, bil_noexp=None):
    """Time ONLY the learned-denoiser block (apply_denoiser: bilateral +
    packed UNet + blends) at config3 resolution with the shipped weights.
    No trace kernel — compiles in seconds, isolates the 37.3 ms block
    (batch40/41 c3_post minus c3_post_nodn)."""
    import glob

    from raytracingdiffusioncurves_tpu.models import denoiser as dn
    from raytracingdiffusioncurves_tpu.ops import denoise as denoise_ops

    if bil_bf16 is not None:
        denoise_ops.BILATERAL_BF16 = bil_bf16
    if bil_noexp is not None:
        denoise_ops._ABLATE_BILATERAL_NOEXP = bil_noexp
    h, w = 1088, 1920
    cands = sorted(glob.glob("weights/denoiser*.msgpack"),
                   key=lambda p: -os.path.getmtime(p))
    params = dn.load_params(cands[0])
    model = dn.net_for_params(params)
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (h, w, 4), jnp.float32)
    bmap = jnp.zeros((h, w), jnp.float32)

    @jax.jit
    def run_n(img0, n):
        def body(i, carry):
            return dn.apply_denoiser(
                model, params, carry, carry, bmap, frame=1)

        return jax.lax.fori_loop(0, n, body, img0)

    out = run_n(img, 1)
    float(out[0, 0, 0])
    t0 = time.perf_counter()
    out = run_n(img, frames)
    float(out[0, 0, 0])
    ms = (time.perf_counter() - t0) * 1000 / frames
    print(json.dumps({"label": label, "ms": round(ms, 2)}), flush=True)
    return ms


PROBES = {
    # --- denoiser-block design points (config3 tail: 37.3 ms, batch40/41) ---
    # dn_block/dn_block_noexp pin bil_bf16=False so "baseline" and the
    # noexp ablation measure the f32 path they claim (BILATERAL_BF16
    # defaults True; with it unset both probes silently timed bf16 —
    # ADVICE r3).  dn_block_bf16 is the bf16 side of the A/B.
    "dn_block": lambda: time_dn_block(label="dn_block", bil_bf16=False),
    "dn_block_bf16": lambda: time_dn_block(label="dn_block_bf16",
                                           bil_bf16=True),
    "dn_block_noexp": lambda: time_dn_block(label="dn_block_noexp",
                                            bil_bf16=False, bil_noexp=True),
    "dn_block_bf16_noexp": lambda: time_dn_block(
        label="dn_block_bf16_noexp", bil_bf16=True, bil_noexp=True),
    # --- UNet inference design points (config3 tail, batch18: CNN ~30 ms) ---
    "unet_asis": lambda: time_unet_variants("asis", "unet_asis_1080"),
    "unet_s2d": lambda: time_unet_variants("s2d", "unet_s2d_1080"),
    "unet_f32": lambda: time_unet_variants("f32", "unet_f32_1080"),
    "unet_half": lambda: time_unet_variants("half", "unet_half_1080"),
    # round-4 design points: conv-as-9-shifted-matmuls and the 4x4
    # space-to-depth cost model (see time_unet_variants)
    "unet_dots": lambda: time_unet_variants("dots", "unet_dots_1080"),
    "unet_s4d": lambda: time_unet_variants("s4d", "unet_s4d_1080"),
    # round-5 Pallas fused-conv A/B (the real packed forward, shipped
    # weights; up_xla = the same forward with the XLA conv for a matched
    # baseline — unet_s2d was a weightless cost model)
    "up_xla": lambda: time_unet_pallas("unet_packed_xla_1080", pallas=False),
    "up_nb2": lambda: time_unet_pallas("unet_packed_pallas_nb2_1080", nbuf=2),
    "up_nb1": lambda: time_unet_pallas("unet_packed_pallas_nb1_1080", nbuf=1),
    "up_nb2_b13": lambda: time_unet_pallas(
        "unet_packed_pallas_nb2_b13_1080", nbuf=2, budget=13 << 20),
    # --- config3 tail decomposition (lady_bug 1080p, shipped weights) ---
    "c3_post": lambda: time_post_c3(label="c3_post"),
    "c3_post_noblur": lambda: time_post_c3(label="c3_post_noblur", blur=False),
    "c3_post_nodn": lambda: time_post_c3(label="c3_post_nodn", denoiser=False),
    # --- config4 decomposition (arch 1080p, 8 rpp progressive trace) ---
    "c4_hoist": lambda: time_trace(
        f"{XMLS}/arch.xml", 1920, 1088, 8, frames=20, hoist=True,
        label="c4_trace_hoisted",
    ),
    "c4_inframe_slot": lambda: time_trace(
        f"{XMLS}/arch.xml", 1920, 1088, 8, frames=20,
        label="c4_trace_inframe_slot",
    ),
    "c4_inframe_cheap": lambda: time_trace(
        f"{XMLS}/arch.xml", 1920, 1088, 8, frames=20, cheap=True,
        label="c4_trace_inframe_cheap",
    ),
    "c4_entry": lambda: time_trace(
        f"{XMLS}/arch.xml", 1920, 1088, 8, frames=20, hoist=True,
        ablate="entry", label="c4_trace_entry",
    ),
    "c4_rb8k": lambda: time_trace(
        f"{XMLS}/arch.xml", 1920, 1088, 8, frames=20, hoist=True,
        rays_per_block=8192, label="c4_trace_hoisted_rb8k",
    ),
    "c4_rb16k": lambda: time_trace(
        f"{XMLS}/arch.xml", 1920, 1088, 8, frames=20, hoist=True,
        rays_per_block=16384, label="c4_trace_hoisted_rb16k",
    ),
    "c4_cheap_rb8k": lambda: time_trace(
        f"{XMLS}/arch.xml", 1920, 1088, 8, frames=20, cheap=True,
        rays_per_block=8192, label="c4_trace_cheap_rb8k",
    ),
    "c4_post": lambda: time_postprocess(
        1920, 1088, label="c4_postprocess_denoise_blurzero"
    ),
    "c4_post_noblur": lambda: time_postprocess(
        1920, 1088, blur=False, label="c4_postprocess_denoise_only"
    ),
    # --- headline variants (round-3 sweep for the last few ms) ---
    "h_rb2k": lambda: time_trace(
        f"{XMLS}/arch.xml", 1024, 1024, 128, hoist=True, rays_per_block=2048,
        label="h_arch1024_128_rb2k",
    ),
    "h_rb1k": lambda: time_trace(
        f"{XMLS}/arch.xml", 1024, 1024, 128, hoist=True, rays_per_block=1024,
        label="h_arch1024_128_rb1k",
    ),
    "h_par": lambda: time_trace(
        f"{XMLS}/arch.xml", 1024, 1024, 128, hoist=True,
        dim_semantics="parallel", label="h_arch1024_128_par",
    ),
    "h_iso_b3": lambda: time_trace(
        f"{XMLS}/arch.xml", 1024, 1024, 128, hoist=True, bisect_iters=3,
        label="h_arch1024_128_b3",
    ),
    # --- dense-scene stage split (hoisted capped lists + horizon) ---
    "lb_entry": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, ablate="entry", label="lb1080_256_h2",
    ),
    "lb_intersect": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, ablate="intersect", label="lb1080_256_h2",
    ),
    "lb_gather": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, ablate="gather", label="lb1080_256_h2",
    ),
    # dense wedge-width sweep: with distance-sorted capped lists + early
    # exit, the walk is distance-bounded, so angular cull precision matters
    # less than the per-wedge fixed costs (W x programs instances).
    "lb_sw8": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, wedge_samples=8, label="lb1080_256_sw8",
    ),
    "lb_sw16": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, wedge_samples=16, label="lb1080_256_sw16",
    ),
    "lb_rb2k": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, rays_per_block=2048, label="lb1080_256_rb2k",
    ),
    "lb_sw8rb2k": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, wedge_samples=8, rays_per_block=2048,
        label="lb1080_256_sw8rb2k",
    ),
    "dol_sw8": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, wedge_samples=8, label="dol1080_64_sw8",
    ),
    "dol_sw16": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, wedge_samples=16, label="dol1080_64_sw16",
    ),
    # --- round-3 dense levers: finer wedges (shorter lists along the
    # angular axis; sw8/16 widening regressed ~linearly, so sw2 should win
    # by the same pairs ~ cnt(w) x sw scaling) and the lane-split walk
    # (per-sub-tile early exits at zero table cost). ---
    "lb_nohz": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, scene_horizon=False, label="lb1080_256_nohz",
    ),
    "dol_nohz": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, scene_horizon=False, label="dol1080_64_nohz",
    ),
    "dol_sw2rb512": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, wedge_samples=2, rays_per_block=512,
        label="dol1080_64_sw2rb512",
    ),
    "lb_q2": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, walk_split=2, label="lb1080_256_q2",
    ),
    "lb_q4": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, walk_split=4, label="lb1080_256_q4",
    ),
    "lb_sw2": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, wedge_samples=2, wedge_cap=128,
        label="lb1080_256_sw2",
    ),
    "lb_sw2q4": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, wedge_samples=2, wedge_cap=128, walk_split=4,
        label="lb1080_256_sw2q4",
    ),
    "lb_sw2rb1k": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, wedge_samples=2, wedge_cap=128,
        rays_per_block=1024, label="lb1080_256_sw2rb1k",
    ),
    "lb_rb1k": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, rays_per_block=1024, label="lb1080_256_rb1k",
    ),
    "dol_sw2": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, wedge_samples=2, label="dol1080_64_sw2",
    ),
    "dol_q4": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, walk_split=4, label="dol1080_64_q4",
    ),
    "dol_sw2q4": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, wedge_samples=2, walk_split=4,
        label="dol1080_64_sw2q4",
    ),
    # --- adaptive flattening (min_subdivisions=2): sagitta-ruled chord
    # counts — lady_bug 2624 -> ~1330 sub-segments, dolphin 28.8k -> ~11.6k;
    # exactness is unchanged by design (band + root isolation) ---
    "lb_ad": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, label="lb1080_256_ad",
    ),
    "lb_ad_rb1k": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, rays_per_block=1024,
        label="lb1080_256_ad_rb1k",
    ),
    "dol_ad": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, label="dol1080_64_ad",
    ),
    "dol_ad_sw2": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, wedge_samples=2,
        label="dol1080_64_ad_sw2",
    ),
    "lb_ad_nooffb": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, ablate_offb=True,
        label="lb1080_256_ad_nooffb",
    ),
    "dol_ad_nooffb": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, ablate_offb=True,
        label="dol1080_64_ad_nooffb",
    ),
    # --- dense attribution: remap / overflow-fallback shares (output wrong
    # where they bite; timing attribution only) + the MXU remap A/B ---
    "lb_noremap": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, ablate_remap=True, label="lb1080_256_noremap",
    ),
    "lb_nooffb": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, ablate_offb=True, label="lb1080_256_nooffb",
    ),
    "lb_mxuremap": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, remap_mxu=True, label="lb1080_256_mxuremap",
    ),
    # --- multi-LEVEL capped lists (round-3): A/B the level count at the
    # shipped dense defaults (min_sub=2, sagitta=0.5; dolphin adds sw2) ---
    **{
        f"lb_s05_l{lv}": (lambda lv=lv: time_trace(
            f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
            frames=3, hoist=True, min_sub=2, sagitta=0.5, cand_levels=lv,
            label=f"lb1080_256_s05_l{lv}",
        ))
        for lv in (1, 2, 3, 4)
    },
    **{
        f"dol_s05_sw2_l{lv}": (lambda lv=lv: time_trace(
            f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
            frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
            cand_levels=lv, label=f"dol1080_64_s05_sw2_l{lv}",
        ))
        for lv in (1, 2, 3, 4, 6, 8)
    },
    # --- round-4 stage ablations + block/dimsem retune at the sg state ---
    **{
        f"lb_s05_ab_{ab}": (lambda ab=ab: time_trace(
            f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
            frames=3, hoist=True, min_sub=2, sagitta=0.5, ablate=ab,
            label=f"lb1080_256_s05_ab_{ab}",
        ))
        for ab in ("entry", "raygen", "intersect", "gather", "shade")
    },
    **{
        f"dol_s05_ab_{ab}": (lambda ab=ab: time_trace(
            f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
            frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
            ablate=ab, label=f"dol1080_64_s05_sw2_ab_{ab}",
        ))
        for ab in ("entry", "intersect", "gather", "shade")
    },
    "lb_s05_rb4k": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5, rays_per_block=4096,
        label="lb1080_256_s05_rb4k",
    ),
    "lb_s05_dimpar": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5,
        dim_semantics="parallel", label="lb1080_256_s05_dimpar",
    ),
    # --- round-5 VMEM-freed retries (sgeom off the scoped VMEM block) ---
    "dol_s05_g1024": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        gather_gsc=1024, label="dol1080_64_s05_sw2_g1024",
    ),
    "dol_s05_l6": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        cand_levels=6, label="dol1080_64_s05_sw2_l6",
    ),
    # --- round-5 entry ablations at the committed s05 flags ---
    "lb_s05_entry": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5, ablate="entry",
        label="lb1080_256_s05_entry",
    ),
    "dol_s05_entry": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        ablate="entry", label="dol1080_64_s05_sw2_entry",
    ),
    # --- round-5 cand_levels re-probe at the chunk-cover era ---
    "lb_s05_l1": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5, cand_levels=1,
        label="lb1080_256_s05_l1",
    ),
    "lb_s05_l2": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5, cand_levels=2,
        label="lb1080_256_s05_l2",
    ),
    # --- round-5 band-only sweep A/B (_BAND_ONLY) ---
    "lb_s05_bo": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5, band_only=True,
        label="lb1080_256_s05_bandonly",
    ),
    "lb_s05_nbo": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5, band_only=False,
        label="lb1080_256_s05_dualchain",
    ),
    "dol_s05_bo": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        band_only=True, label="dol1080_64_s05_sw2_bandonly",
    ),
    "dol_s05_nbo": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        band_only=False, label="dol1080_64_s05_sw2_dualchain",
    ),
    # --- round-5 level-split phase-1 sg dot A/B (_SG_LEVEL_SPLIT) ---
    "lb_s05_lsp": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5, sg_lsplit=True,
        label="lb1080_256_s05_lsplit",
    ),
    "lb_s05_nlsp": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5, sg_lsplit=False,
        label="lb1080_256_s05_nolsplit",
    ),
    "dol_s05_lsp": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        sg_lsplit=True, label="dol1080_64_s05_sw2_lsplit",
    ),
    "dol_s05_nlsp": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        sg_lsplit=False, label="dol1080_64_s05_sw2_nolsplit",
    ),
    # --- round-4 slot-geom design A/B (_SLOTGEOM; default ON) ---
    "lb_s05_sg": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5, slotgeom=True,
        label="lb1080_256_s05_sg",
    ),
    "lb_s05_nsg": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5, slotgeom=False,
        label="lb1080_256_s05_nsg",
    ),
    "dol_s05_sg": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        slotgeom=True, label="dol1080_64_s05_sw2_sg",
    ),
    "dol_s05_nsg": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        slotgeom=False, label="dol1080_64_s05_sw2_nsg",
    ),
    "dol_s05_ncc": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        chunk_cover=False, label="dol1080_64_s05_sw2_ncc",
    ),
    "lb_s05_ncc": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5, chunk_cover=False,
        label="lb1080_256_s05_ncc",
    ),
    "lb_s05_q2": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5, walk_split=2,
        label="lb1080_256_s05_q2",
    ),
    # fresh stage split at the exact config3 defaults (levels auto = 2)
    **{
        f"lb_s05_{ab}": (lambda ab=ab: time_trace(
            f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
            frames=3, hoist=True, min_sub=2, sagitta=0.5,
            ablate=None if ab == "full" else ab,
            label=f"lb1080_256_s05_{ab}",
        ))
        for ab in ("full", "entry", "intersect", "gather")
    },
    # --- batch 15: two-phase final-winner gather A/B (exact output) ---
    "lb_s05_tp0": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5, two_phase=False,
        label="lb1080_256_s05_tp0",
    ),
    "dol_s05_tp0": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        two_phase=False, label="dol1080_64_s05_sw2_tp0",
    ),
    "lb_s05_rp0": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5, remap_pair=False,
        label="lb1080_256_s05_rp0",
    ),
    # --- batch 14: fallback/cond structure probes (ALL exact-output) ---
    "lb_s05_fbnc": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5,
        exact_ablate="fb_nocond", label="lb1080_256_s05_fbnc",
    ),
    "lb_s05_isonc": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5,
        exact_ablate="iso_nocond", label="lb1080_256_s05_isonc",
    ),
    "lb_s05_rb1024": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5, rays_per_block=1024,
        label="lb1080_256_s05_rb1024",
    ),
    "lb_s05_cw2": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5, cwalk_split=2,
        label="lb1080_256_s05_cw2",
    ),
    "dol_s05_cw2": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        cwalk_split=2, label="dol1080_64_s05_sw2_cw2",
    ),
    # --- batch 23: paired chunk-walk body (exit reductions amortized) ---
    "dol_s05_cp2": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        cwalk_pair=2, label="dol1080_64_s05_sw2_cp2",
    ),
    "dol_s05_cp4": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        cwalk_pair=4, label="dol1080_64_s05_sw2_cp4",
    ),
    # --- batch 26: walk pairing on the RESTORED post-walk-remap kernel ---
    "dol_s05_cp8": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        cwalk_pair=8, label="dol1080_64_s05_sw2_cp8",
    ),
    "lb_s05_cp4": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5, cwalk_pair=4,
        label="lb1080_256_s05_cp4",
    ),
    "lb_s05_lp4": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5, lwalk_pair=4,
        label="lb1080_256_s05_lp4",
    ),
    "lb_s05_cp2_lp4": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5, cwalk_pair=2,
        lwalk_pair=4, label="lb1080_256_s05_cp2_lp4",
    ),
    "dol_s05_lp4": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        lwalk_pair=4, label="dol1080_64_s05_sw2_lp4",
    ),
    "lb_s05_lp8": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5, lwalk_pair=8,
        label="lb1080_256_s05_lp8",
    ),
    "dol_s05_lp8": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        lwalk_pair=8, label="dol1080_64_s05_sw2_lp8",
    ),
    # --- batch 30: wedge granularity (sw8 measured 656.8 on lb; sw2 never
    # probed there — halves each cell's angular span at 2x the wedge count
    # and a 2x-taller tile; dol sw1 likewise untried) ---
    "lb_s05_sw2": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        label="lb1080_256_s05_sw2",
    ),
    "dol_s05_sw1": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=1,
        label="dol1080_64_s05_sw1",
    ),
    # --- batch 34: the two batch33-guided optimizations.  gsc: gather
    # chunk width 512 (default; g128 = the round-2 width for A/B).
    # remap builds: fold (one reshape) / tslice8 (transpose + 8 lane
    # slices) vs the slices16 storm; all output-identical. ---
    # --- outmask: build the low-bit one-hot once per gather and mask the
    # (m_rows, R) MXU output per chunk step (bi_hi == c) — the opposite
    # trade from _GATHER_REUSE's pre-MXU (gsc, R) multiply. ---
    "lb_s05_om": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5, gather_outmask=True,
        label="lb1080_256_s05_om",
    ),
    "dol_s05_om": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        gather_outmask=True, label="dol1080_64_s05_sw2_om",
    ),
    "lb_s05_g128": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5, gather_gsc=128,
        label="lb1080_256_s05_g128",
    ),
    "lb_s05_fold": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5, remap_build="fold",
        label="lb1080_256_s05_fold",
    ),
    "lb_s05_tsl8": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5,
        remap_build="tslice8", label="lb1080_256_s05_tsl8",
    ),
    "dol_s05_g128": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        gather_gsc=128, label="dol1080_64_s05_sw2_g128",
    ),
    "dol_s05_fold": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        remap_build="fold", label="dol1080_64_s05_sw2_fold",
    ),
    "dol_s05_tsl8": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        remap_build="tslice8", label="dol1080_64_s05_sw2_tsl8",
    ),
    # --- batch 35: gsc mid/wide points + the remap-table attribution
    # REALITY CHECK.  rtb: the id table becomes an unfoldable broadcast of
    # one dynamic value — if this matches chl (zeros table), the 53/139 ms
    # chl attribution really is the relayout build; if it snaps back to
    # the full time, chl was folding the remap matmuls too and the build
    # is NOT the target.  chlg1: chl + gspan1 combined ceiling. ---
    "lb_s05_rtb": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5,
        ablate_remap_table="bcast", label="lb1080_256_s05_rtb",
    ),
    "dol_s05_rtb": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        ablate_remap_table="bcast", label="dol1080_64_s05_sw2_rtb",
    ),
    "lb_s05_g256": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5, gather_gsc=256,
        label="lb1080_256_s05_g256",
    ),
    "dol_s05_g1024": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        gather_gsc=1024, label="dol1080_64_s05_sw2_g1024",
    ),
    "lb_s05_chlg1": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5,
        ablate_remap_table=True, gspan1=True, label="lb1080_256_s05_chlg1",
    ),
    # --- batch 37: dolphin entry share at the shipped dense defaults
    # (the lb one rides the s05 ablation comprehension above) ---
    "dol_s05_entry": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        ablate="entry", label="dol1080_64_s05_sw2_entry",
    ),
    # --- batch 36: hit-lane-only gather spans (default ON; nhs = the
    # round-2/3 full-span walk for A/B — output-identical, parity-pinned).
    # "full"/"l4" rows re-run as the ON side at the committed defaults. ---
    "lb_s05_nhs": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5,
        gather_hit_span=False, label="lb1080_256_s05_nhs",
    ),
    "dol_s05_nhs": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        gather_hit_span=False, label="dol1080_64_s05_sw2_nhs",
    ),
    "dol_s05_def": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        label="dol1080_64_s05_sw2_def",
    ),
    # --- batch 38/39: precomputed remap tables A/B — measured SLOWER on
    # both dense headliners (see _REMAP_PRECOMP; default now OFF).  nrp =
    # explicit OFF (the default); rp = the precomp lever ON. ---
    "lb_s05_nrp": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5,
        remap_precomp=False, label="lb1080_256_s05_nrp",
    ),
    "dol_s05_nrp": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        remap_precomp=False, label="dol1080_64_s05_sw2_nrp",
    ),
    "lb_s05_rp": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5,
        remap_precomp=True, label="lb1080_256_s05_rp",
    ),
    "dol_s05_rp": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        remap_precomp=True, label="dol1080_64_s05_sw2_rp",
    ),
    # headline guard: arch is slot-mode single-chunk (no span walk), so
    # the hit-span change must be a no-op there — one confirmation run
    "h_arch1024_128_hs": lambda: time_trace(
        f"{XMLS}/arch.xml", 1024, 1024, 128, frames=10, hoist=True,
        rays_per_block=2048, label="arch1024_128_hs",
    ),
    # --- batch 33: config3 tail decomposition (timing-only ablations) ---
    # chl: the remap's hierarchical id-table build (16 sublane slices +
    # hi/lo split) replaced by a constant — the table-build share of the
    # 68 ms remap attribution.  gspan1: winner gathers walk one chunk —
    # the span share vs fixed per-gather cost of the 146 ms gather block.
    "lb_s05_chl": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5,
        ablate_remap_table=True, label="lb1080_256_s05_chl",
    ),
    "lb_s05_gspan1": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5, gspan1=True,
        label="lb1080_256_s05_gspan1",
    ),
    "dol_s05_chl": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        ablate_remap_table=True, label="dol1080_64_s05_sw2_chl",
    ),
    "dol_s05_gspan1": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        gspan1=True, label="dol1080_64_s05_sw2_gspan1",
    ),
    # --- batch 31: factored multi-chunk gather one-hot (A/B: reuse OFF =
    # the round-2 fresh-compare build) ---
    "lb_s05_ngre": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5, gather_reuse=False,
        label="lb1080_256_s05_ngre",
    ),
    "dol_s05_ngre": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        gather_reuse=False, label="dol1080_64_s05_sw2_ngre",
    ),
    "dol_s05_cp8_lp4": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        cwalk_pair=8, lwalk_pair=4, label="dol1080_64_s05_sw2_cp8_lp4",
    ),
    # --- batch 24: phase-1 block under the graze cond (gather in-branch;
    # Mosaic crash risk contained by --isolate) ---
    "lb_s05_p1c": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5, phase1_cond=True,
        label="lb1080_256_s05_p1c",
    ),
    "dol_s05_p1c": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        phase1_cond=True, label="dol1080_64_s05_sw2_p1c",
    ),
    "lb_s05_cp2": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5, cwalk_pair=2,
        label="lb1080_256_s05_cp2",
    ),
    "dol_s05_cw4": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        cwalk_split=4, label="dol1080_64_s05_sw2_cw4",
    ),
    "dol_s05_cw8": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        cwalk_split=8, label="dol1080_64_s05_sw2_cw8",
    ),
    "lb_s05_rb4k": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5, rays_per_block=4096,
        label="lb1080_256_s05_rb4k",
    ),
    # rb8k/dol_rb4k: re-probe block size at the post-batch17 operating point
    # (415 ms full, entry 34.8) — with per-wedge fixed costs now ~8% of the
    # frame, fewer/bigger programs may win where they were neutral at 518.
    "lb_s05_rb8k": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5, rays_per_block=8192,
        label="lb1080_256_s05_rb8k",
    ),
    "dol_s05_rb4k": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        rays_per_block=4096, label="dol1080_64_s05_sw2_rb4k",
    ),
    "lb_s05_sw8": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=8,
        label="lb1080_256_s05_sw8",
    ),
    "lb_s05_noremap": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5, ablate_remap=True,
        label="lb1080_256_s05_noremap",
    ),
    "lb_s05_mxuremap": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5, remap_mxu=True,
        label="lb1080_256_s05_mxuremap",
    ),
    "lb_s05_nofb": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5,
        exact_ablate="no_fallback", label="lb1080_256_s05_nofb",
    ),
    "lb_s05_legacy": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5,
        exact_ablate="legacy_refine", label="lb1080_256_s05_legacy",
    ),
    "lb_s05_nooffb": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5, ablate_offb=True,
        label="lb1080_256_s05_nooffb",
    ),
    "lb_s05_l3_nooffb": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5, cand_levels=3,
        ablate_offb=True, label="lb1080_256_s05_l3_nooffb",
    ),
    "dol_s05_sw2_l3_nooffb": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        cand_levels=3, ablate_offb=True, label="dol1080_64_s05_sw2_l3_nooffb",
    ),
    # --- adaptive-flattening (config3 default) deep-dive: stage split at
    # min_sub=2 and sagitta sweeps (larger sagitta halves sub-segments
    # again; exactness class unchanged — device.py docstring)
    "lb_ad_entry": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, ablate="entry",
        label="lb1080_256_ad",
    ),
    "lb_ad_intersect": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, ablate="intersect",
        label="lb1080_256_ad",
    ),
    "lb_ad_gather": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, ablate="gather",
        label="lb1080_256_ad",
    ),
    "lb_ad_s05": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=0.5,
        label="lb1080_256_ad_s05",
    ),
    "lb_ad_s10": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, sagitta=1.0,
        label="lb1080_256_ad_s10",
    ),
    "lb_ad_rb2k": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, min_sub=2, rays_per_block=2048,
        label="lb1080_256_ad_rb2k",
    ),
    "dol_ad_s05": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=0.5, wedge_samples=2,
        label="dol1080_64_ad_sw2_s05",
    ),
    "dol_ad_s10": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, min_sub=2, sagitta=1.0, wedge_samples=2,
        label="dol1080_64_ad_sw2_s10",
    ),
    "dol_noremap": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, ablate_remap=True, label="dol1080_64_noremap",
    ),
    "dol_nooffb": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, ablate_offb=True, label="dol1080_64_nooffb",
    ),
    "dol_mxuremap": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, remap_mxu=True, label="dol1080_64_mxuremap",
    ),
    "dol_gather": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, ablate="gather", label="dol1080_64_h2",
    ),
    "dol_entry": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, ablate="entry", label="dol1080_64_h2",
    ),
    "dol_intersect": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, ablate="intersect", label="dol1080_64_h2",
    ),
    # --- hoisted-table (production static-camera) ablation set ---
    "h_base": lambda: time_trace(
        f"{XMLS}/arch.xml", 1024, 1024, 128, hoist=True, label="h_arch1024_128"
    ),
    "h_entry": lambda: time_trace(
        f"{XMLS}/arch.xml", 1024, 1024, 128, hoist=True, ablate="entry",
        label="h_arch1024_128",
    ),
    "h_raygen": lambda: time_trace(
        f"{XMLS}/arch.xml", 1024, 1024, 128, hoist=True, ablate="raygen",
        label="h_arch1024_128",
    ),
    "h_intersect": lambda: time_trace(
        f"{XMLS}/arch.xml", 1024, 1024, 128, hoist=True, ablate="intersect",
        label="h_arch1024_128",
    ),
    "h_gather": lambda: time_trace(
        f"{XMLS}/arch.xml", 1024, 1024, 128, hoist=True, ablate="gather",
        label="h_arch1024_128",
    ),
    "h_shade": lambda: time_trace(
        f"{XMLS}/arch.xml", 1024, 1024, 128, hoist=True, ablate="shade",
        label="h_arch1024_128",
    ),
    "h_legacyref": lambda: time_trace(
        f"{XMLS}/arch.xml", 1024, 1024, 128, hoist=True,
        exact_ablate="legacy_refine", label="h_arch1024_128",
    ),
    "h_nofb": lambda: time_trace(
        f"{XMLS}/arch.xml", 1024, 1024, 128, hoist=True,
        exact_ablate="no_fallback", label="h_arch1024_128",
    ),
    # EXACT-OUTPUT cond-structure variants (identical image, different
    # control flow — candidates to become the default):
    "h_isonc": lambda: time_trace(
        f"{XMLS}/arch.xml", 1024, 1024, 128, hoist=True,
        exact_ablate="iso_nocond", label="h_arch1024_128_isonc",
    ),
    "h_fbnc": lambda: time_trace(
        f"{XMLS}/arch.xml", 1024, 1024, 128, hoist=True,
        exact_ablate="fb_nocond", label="h_arch1024_128_fbnc",
    ),
    # Bigger blocks (feasible since the tiled reduction freed ~8 MB VMEM):
    # halves program count and amortizes per-wedge fixed costs over 2x rays.
    "h_rb8k": lambda: time_trace(
        f"{XMLS}/arch.xml", 1024, 1024, 128, hoist=True, rays_per_block=8192,
        label="h_arch1024_128_rb8k",
    ),
    "h_rb16k": lambda: time_trace(
        f"{XMLS}/arch.xml", 1024, 1024, 128, hoist=True,
        rays_per_block=16384, label="h_arch1024_128_rb16k",
    ),
    "arch512": lambda: time_trace(f"{XMLS}/arch.xml", 512, 512, 16, label="arch512_16"),
    "arch512_128": lambda: time_trace(
        f"{XMLS}/arch.xml", 512, 512, 128, label="arch512_128"
    ),
    "arch1024": lambda: time_trace(
        f"{XMLS}/arch.xml", 1024, 1024, 128, label="arch1024_128"
    ),
    "arch1024_nocand": lambda: time_trace(
        f"{XMLS}/arch.xml", 1024, 1024, 128, no_cand=True, label="arch1024_128"
    ),
    "arch1024_raygen": lambda: time_trace(
        f"{XMLS}/arch.xml", 1024, 1024, 128, ablate="raygen", label="arch1024_128"
    ),
    "arch1024_intersect": lambda: time_trace(
        f"{XMLS}/arch.xml", 1024, 1024, 128, ablate="intersect", label="arch1024_128"
    ),
    "arch1024_gather": lambda: time_trace(
        f"{XMLS}/arch.xml", 1024, 1024, 128, ablate="gather", label="arch1024_128"
    ),
    "arch1024_gather_nocand": lambda: time_trace(
        f"{XMLS}/arch.xml", 1024, 1024, 128, ablate="gather", no_cand=True,
        label="arch1024_128",
    ),
    "arch1024_shade": lambda: time_trace(
        f"{XMLS}/arch.xml", 1024, 1024, 128, ablate="shade", label="arch1024_128"
    ),
    "arch1024_entry": lambda: time_trace(
        f"{XMLS}/arch.xml", 1024, 1024, 128, ablate="entry", label="arch1024_128"
    ),
    "arch1024_prepass": lambda: time_prepass(
        f"{XMLS}/arch.xml", 1024, 1024, 128, label="arch1024_128_prepass"
    ),
    "arch1024_rb8k": lambda: time_trace(
        f"{XMLS}/arch.xml", 1024, 1024, 128, rays_per_block=8192,
        label="arch1024_128_rb8192",
    ),
    "arch1024_rb16k": lambda: time_trace(
        f"{XMLS}/arch.xml", 1024, 1024, 128, rays_per_block=16384,
        label="arch1024_128_rb16384",
    ),
    "arch1024_rb8k_entry": lambda: time_trace(
        f"{XMLS}/arch.xml", 1024, 1024, 128, rays_per_block=8192, ablate="entry",
        label="arch1024_128_rb8192",
    ),
    "arch1024_exact_legacyref": lambda: time_trace(
        f"{XMLS}/arch.xml", 1024, 1024, 128, exact_ablate="legacy_refine",
        label="arch1024_128_exact_legacyref",
    ),
    "arch1024_exact_nofb": lambda: time_trace(
        f"{XMLS}/arch.xml", 1024, 1024, 128, exact_ablate="no_fallback",
        label="arch1024_128_exact_nofb",
    ),
    "ladybug512": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 512, 512, 64,
        frames=4, label="ladybug512_64",
    ),
    "ladybug1080": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=2, label="ladybug1080_256",
    ),
    "dolphin1080": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=1, label="dolphin1080_64",
    ),
    # --- dense-scene accel experiments (VERDICT r2 #2) ---
    # lady_bug now fits segment lists (transposed tables); dolphin stays on
    # chunk lists — the rays_per_block sweep probes whether tighter origin
    # circles (better lb culling + tighter worst-t early exit) beat the
    # extra program-entry cost on dense scenes.
    "lb1080_h": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, label="lb1080_256_h",
    ),
    "lb1080_h_rb1k": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, rays_per_block=1024, label="lb1080_256_h_rb1k",
    ),
    "lb1080_h_intersect": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, ablate="intersect", label="lb1080_256_h",
    ),
    "lb1080_h_gather": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, ablate="gather", label="lb1080_256_h",
    ),
    "lb1080_h_entry": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, ablate="entry", label="lb1080_256_h",
    ),
    "lb1080_h_raygen": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, ablate="raygen", label="lb1080_256_h",
    ),
    "dol1080_h": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, label="dol1080_64_h",
    ),
    "dol1080_h_rb2k": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, rays_per_block=2048, label="dol1080_64_h_rb2k",
    ),
    "dol1080_h_rb1k": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, rays_per_block=1024, label="dol1080_64_h_rb1k",
    ),
    "dol1080_h_rb512": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, rays_per_block=512, label="dol1080_64_h_rb512",
    ),
    # Wedge-width sweep on the headline config (arch is multi-chunk at
    # s_pad=128: sw=4 gives 32 wedges/pixel — per-wedge fixed costs x32;
    # wider wedges halve them against more candidates per cell).
    "h_sw8": lambda: time_trace(
        f"{XMLS}/arch.xml", 1024, 1024, 128, hoist=True, wedge_samples=8,
        label="h_arch1024_128_sw8",
    ),
    "h_sw16": lambda: time_trace(
        f"{XMLS}/arch.xml", 1024, 1024, 128, hoist=True, wedge_samples=16,
        label="h_arch1024_128_sw16",
    ),
    # sw x rays_per_block combos: wider wedges halve sweep instances (total
    # swept rows/pixel ~ W * 8 while counts stay <= 8) but shrink pxb at
    # fixed R — bigger blocks restore the program count.
    "h_sw8rb8k": lambda: time_trace(
        f"{XMLS}/arch.xml", 1024, 1024, 128, hoist=True, wedge_samples=8,
        rays_per_block=8192, label="h_arch1024_128_sw8rb8k",
    ),
    "h_sw8rb16k": lambda: time_trace(
        f"{XMLS}/arch.xml", 1024, 1024, 128, hoist=True, wedge_samples=8,
        rays_per_block=16384, label="h_arch1024_128_sw8rb16k",
    ),
    "h_sw16rb16k": lambda: time_trace(
        f"{XMLS}/arch.xml", 1024, 1024, 128, hoist=True, wedge_samples=16,
        rays_per_block=16384, label="h_arch1024_128_sw16rb16k",
    ),
    # dense-scene rerun with capped lists + horizon fallback (round 3)
    "lb1080_h2": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/lady_bug.xml", 1920, 1088, 256,
        frames=3, hoist=True, label="lb1080_256_h2",
    ),
    "dol1080_h2": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, label="dol1080_64_h2",
    ),
    "dol1080_h2_rb2k": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, rays_per_block=2048, label="dol1080_64_h2_rb2k",
    ),
    "dol1080_h2_sw2": lambda: time_trace(
        f"{XMLS}/DiffusionCurvePack/dolphin.xml", 1920, 1088, 64,
        frames=2, hoist=True, wedge_samples=2, label="dol1080_64_h2_sw2",
    ),
}


if __name__ == "__main__":
    args = sys.argv[1:]
    # --isolate: one subprocess per probe — a fatal kernel error (Mosaic
    # crash, OOM) poisons the process's TPU client and every later probe in
    # the batch would report a bogus Internal error.
    if args and args[0].startswith("--isolate"):
        import subprocess

        # --isolate=SECS overrides the per-probe timeout (remote-AOT kernel
        # compiles have been observed past 60 min on bad days); a timed-out
        # probe is reported and SKIPPED instead of aborting the batch
        # (batch36 lost four probes to one dolphin compile).
        per_probe = int(args[0].partition("=")[2] or 7200)
        for n in args[1:]:
            try:
                subprocess.run(
                    [sys.executable, os.path.abspath(__file__), n],
                    cwd="/root/repo", timeout=per_probe,
                )
            except subprocess.TimeoutExpired:
                print(
                    json.dumps({"label": n, "error": f"timeout {per_probe}s"}),
                    flush=True,
                )
        sys.exit(0)
    names = args or ["arch512", "arch1024", "arch1024_raygen", "arch1024_intersect"]
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    for n in names:
        PROBES[n]()
