"""Pallas megakernel vs pure-JAX path parity (interpret mode on CPU).

The two implementations share the math but not the code shape (chunked
sublane tiles + one-hot MXU gathers vs XLA broadcasting); rendering the same
scenes pins them against each other.  Tolerances allow for the kernel's
approximate reciprocal, which can flip the closest-hit winner at exact
segment-junction ties for a ~1e-6 fraction of rays.
"""

import numpy as np
import pytest

import raytracingdiffusioncurves_tpu as rtdc

from conftest import make_scene_xml, simple_curve


def render_both(xml_or_path, rpp=8, from_file=False, k=8, **cfg_kw):
    if from_file:
        scene = rtdc.load_scene(xml_or_path)
    else:
        scene = rtdc.load_scene_from_string(xml_or_path)
    dev = rtdc.build_device_scene(scene, flatten_subdivisions=k)
    cfg = rtdc.RenderConfig(
        rays_per_pixel=rpp, use_blur=False, use_denoiser=False, **cfg_kw
    )
    img_j, bm_j = rtdc.trace_image(dev, rtdc.Camera(), cfg, backend="jax")
    img_p, bm_p = rtdc.trace_image(dev, rtdc.Camera(), cfg, backend="pallas")
    return (np.asarray(img_j), np.asarray(bm_j)), (np.asarray(img_p), np.asarray(bm_p))


def assert_parity(j, p, frac=3e-5):
    img_j, bm_j = j
    img_p, bm_p = p
    d = np.abs(img_j - img_p)
    assert not np.isnan(img_p).any()
    # identical for all but junction-tie rays
    assert (d > 1e-3).mean() < frac, f"diff frac {(d > 1e-3).mean()}"
    assert d.mean() < 1e-4
    db = np.abs(bm_j - bm_p)
    assert (db > 1e-3).mean() < frac


@pytest.mark.slow
def test_parity_line(ref_xml_dir):
    j, p = render_both(str(ref_xml_dir / "line.xml"), from_file=True)
    assert_parity(j, p)


@pytest.mark.slow
def test_parity_portals(ref_xml_dir):
    j, p = render_both(str(ref_xml_dir / "PortalDemo.xml"), from_file=True)
    assert_parity(j, p)


@pytest.mark.slow
def test_parity_weights_and_blur():
    xml = make_scene_xml(
        [
            simple_curve(
                [(0, 20), (20, 22), (40, 18), (60, 20)],
                left=[(0, "200,10,50"), (5, "0,255,0"), (10, "10,10,200")],
                blur=[(0, 1.0), (10, 3.0)],
                weight=[(0, 0.5), (10, 2.0)],
                weight_degree=[(0, 0.3), (10, 1.1)],
                use_endcap=True,
            )
        ]
    )
    j, p = render_both(xml, rpp=16)
    assert_parity(j, p)


@pytest.mark.slow
def test_parity_no_aa_deterministic():
    # Note: the control polygon deliberately avoids exact multiples of the
    # 45-degree no-AA fan directions — a ray exactly grazing a segment tip is
    # a measure-zero degeneracy where 1-ulp transcendental differences
    # between backends legitimately flip hit/miss.
    xml = make_scene_xml([simple_curve([(11, 14), (29, 23), (41, 38), (49, 54)])])
    j, p = render_both(xml, rpp=8, use_aa=False)
    assert_parity(j, p)


@pytest.mark.slow
def test_parity_camera():
    xml = make_scene_xml([simple_curve([(10, 10), (30, 20), (40, 40), (50, 50)])])
    scene = rtdc.load_scene_from_string(xml)
    dev = rtdc.build_device_scene(scene, flatten_subdivisions=8)
    cfg = rtdc.RenderConfig(rays_per_pixel=8, use_blur=False, use_denoiser=False)
    cam = rtdc.Camera(0.35, 4.0, -7.0)
    img_j, _ = rtdc.trace_image(dev, cam, cfg, backend="jax")
    img_p, _ = rtdc.trace_image(dev, cam, cfg, backend="pallas")
    d = np.abs(np.asarray(img_j) - np.asarray(img_p))
    assert (d > 1e-3).mean() < 3e-5


@pytest.mark.slow
def test_parity_multichunk_culling(ref_xml_dir):
    """lady_bug has ~2.6k sub-segments (41 chunks): exercises the chunk-
    culling accelerator against the brute-force JAX path."""
    scene = rtdc.load_scene(str(ref_xml_dir / "DiffusionCurvePack" / "lady_bug.xml"))
    scene = scene.with_size(48, 48)
    dev = rtdc.build_device_scene(scene, flatten_subdivisions=4)
    assert dev.s_pad > 64  # multiple chunks
    cfg = rtdc.RenderConfig(rays_per_pixel=4, use_blur=False, use_denoiser=False)
    img_j, bm_j = rtdc.trace_image(dev, rtdc.Camera(), cfg, backend="jax")
    img_p, bm_p = rtdc.trace_image(dev, rtdc.Camera(), cfg, backend="pallas")
    assert_parity((np.asarray(img_j), np.asarray(bm_j)), (np.asarray(img_p), np.asarray(bm_p)))


@pytest.mark.slow
@pytest.mark.parametrize("rpp", [32, 64])
def test_parity_multichunk_wedge_culling(ref_xml_dir, rpp):
    """rpp > wedge size activates the direction-wedge grid dimension and the
    angular chunk cull (at rpp=64 the wedge half-angle is pi/8 — a tight,
    genuinely active cone); must stay exact vs the brute-force JAX path.
    Caught the arcsin-saturation overlap bug."""
    scene = rtdc.load_scene(str(ref_xml_dir / "DiffusionCurvePack" / "lady_bug.xml"))
    scene = scene.with_size(32, 32)
    dev = rtdc.build_device_scene(scene, flatten_subdivisions=4)
    cfg = rtdc.RenderConfig(rays_per_pixel=rpp, use_blur=False, use_denoiser=False)
    img_j, _ = rtdc.trace_image(dev, rtdc.Camera(), cfg, backend="jax")
    img_p, _ = rtdc.trace_image(dev, rtdc.Camera(), cfg, backend="pallas")
    d = np.abs(np.asarray(img_j) - np.asarray(img_p))
    # At this thumbnail scale every pixel spans 16 scene px, so curve-
    # crossing near-ties (where the two paths may pick either of two
    # equidistant winners) are common; allow sub-quantization noise but no
    # structural difference.
    assert d.max() < 1.0 / 64.0, f"max {d.max()}"
    assert (d > 1.0 / 255.0).mean() < 1e-4


@pytest.mark.slow
def test_parity_multichunk_portals():
    """Portals plus >64 sub-segments: culling must stay exact across the
    bounded re-trace loop (non-unit continuation directions scale the bound)."""
    curves = [
        simple_curve([(10 + i, 5), (12 + i, 25), (14 + i, 45), (16 + i, 60)])
        for i in range(0, 12, 3)
    ]
    curves.append(simple_curve([(30, 10), (32, 20), (34, 30), (36, 40)], connects=5))
    curves.append(simple_curve([(50, 10), (52, 20), (54, 30), (56, 40)], connects=4))
    xml = make_scene_xml(curves)
    scene = rtdc.load_scene_from_string(xml)
    dev = rtdc.build_device_scene(scene, flatten_subdivisions=16)
    assert dev.s_pad > 64 and dev.has_portals
    cfg = rtdc.RenderConfig(rays_per_pixel=8, use_blur=False, use_denoiser=False)
    img_j, _ = rtdc.trace_image(dev, rtdc.Camera(), cfg, backend="jax")
    img_p, _ = rtdc.trace_image(dev, rtdc.Camera(), cfg, backend="pallas")
    d = np.abs(np.asarray(img_j) - np.asarray(img_p))
    assert (d > 1e-3).mean() < 3e-5


@pytest.mark.parametrize(
    "rpp",
    [pytest.param(1, marks=pytest.mark.slow),
     pytest.param(4, marks=pytest.mark.slow), 8,
     pytest.param(32, marks=pytest.mark.slow)],
)
def test_parity_rpp_blocking(rpp):
    """Exercises the R / px_per_program blocking math for awkward fan sizes."""
    xml = make_scene_xml([simple_curve([(10, 32), (30, 32), (40, 32), (50, 32)])], width=32, height=32)
    j, p = render_both(xml, rpp=rpp)
    assert_parity(j, p)


def test_choose_block_dense_narrows_wedge():
    """Dense scenes (s_pad > DENSE_SPAD) auto-pick 2-sample wedges and
    1024-ray blocks — the measured dolphin-class optimum (batch30: sw2
    742.8 vs sw1 841.0 vs sw4-era 1917; non-dense lady_bug keeps sw4,
    sw2 there measured 1612 vs 408.8)."""
    from raytracingdiffusioncurves_tpu.ops import trace_pallas as tp

    r, pxb, sw, w = tp._choose_block(64, 4096, multi_chunk=True, dense=True)
    assert sw == 2 and r == pxb * sw and r <= 1024
    r4, pxb4, sw4, w4 = tp._choose_block(256, 4096, multi_chunk=True)
    assert sw4 == 4  # non-dense multi-chunk keeps the 4-sample wedge
    # rpp that 2 does not divide: gcd keeps SW a divisor of rpp
    _, _, sw_odd, _ = tp._choose_block(9, 4096, multi_chunk=True, dense=True)
    assert 9 % sw_odd == 0


@pytest.mark.slow
def test_parity_segment_candidates():
    """A 64-sub-segment single-chunk scene at rpp=32 activates the
    per-(tile, wedge) segment candidate lists (ops/candidates.py); parity
    against the brute-force JAX path proves the cull is exact, including
    camera pan/zoom (candidate circles are camera-dependent)."""
    from raytracingdiffusioncurves_tpu.ops import candidates as cm
    from raytracingdiffusioncurves_tpu.ops import trace_pallas as tp

    pts = [(5, 5), (20, 8), (35, 20), (50, 30), (55, 45), (40, 55), (30, 58),
           (20, 55), (10, 45), (8, 35), (15, 25), (25, 20), (35, 18)]
    xml = make_scene_xml(
        [
            simple_curve(
                pts,
                left=[(0, "255,0,0"), (40, "0,0,255")],
                right=[(0, "0,255,0"), (40, "255,255,0")],
            )
        ]
    )
    scene = rtdc.load_scene_from_string(xml)
    dev = rtdc.build_device_scene(scene, flatten_subdivisions=16)
    assert dev.s_pad == 64  # single chunk, large enough for candidate lists
    cfg = rtdc.RenderConfig(rays_per_pixel=32, use_blur=False, use_denoiser=False)
    _, _, sw, nw = tp._choose_block(32, cfg.rays_per_block)
    assert cm.use_candidates(dev.s_pad, 1, nw)  # guard the wiring
    for cam in (rtdc.Camera(), rtdc.Camera(0.4, 6.0, -3.0)):
        img_j, bm_j = rtdc.trace_image(dev, cam, cfg, backend="jax")
        img_p, bm_p = rtdc.trace_image(dev, cam, cfg, backend="pallas")
        assert_parity(
            (np.asarray(img_j), np.asarray(bm_j)),
            (np.asarray(img_p), np.asarray(bm_p)),
        )


@pytest.mark.slow
def test_hoisted_cand_tables_match_inline(ref_xml_dir):
    """build_cand_tables output passed via cand_tables must reproduce the
    inline per-frame prepass bit for bit, for both acceleration kinds
    (segment candidate lists and chunk lists — the hoisted tables are the
    one-time accel build, optixHello.cpp:764-830)."""
    from raytracingdiffusioncurves_tpu.ops import trace_pallas as tp

    for xml, k in (("arch.xml", 16), ("DiffusionCurvePack/lady_bug.xml", 2)):
        scene = rtdc.load_scene(str(ref_xml_dir / xml))
        scene = scene.with_size(48, 48)
        dev = rtdc.build_device_scene(scene, flatten_subdivisions=k)
        cfg = rtdc.RenderConfig(
            rays_per_pixel=16, use_blur=False, use_denoiser=False
        )
        tables = tp.build_cand_tables(dev, rtdc.Camera(), cfg)
        assert tables is not None, xml
        a, _ = rtdc.trace_image(dev, rtdc.Camera(), cfg, backend="pallas")
        b, _ = rtdc.trace_image(
            dev, rtdc.Camera(), cfg, backend="pallas", cand_tables=tables
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=xml)
        # certified gather_len (slot-mode narrow one-hot) is bit-identical
        mx = tp.seg_max_count(dev, tables)
        if mx is not None:
            narrowed = tp.narrow_cand_tables(tables, mx)
            c, _ = rtdc.trace_image(
                dev, rtdc.Camera(), cfg, backend="pallas",
                cand_tables=narrowed, gather_len=mx,
            )
            np.testing.assert_array_equal(np.asarray(a), np.asarray(c), err_msg=xml)


@pytest.mark.slow
def test_world_grid_matches_inline(ref_xml_dir):
    """WorldGrid (camera-independent accel, the reference BVH's role): the
    per-frame grid_tables selection must reproduce the inline per-camera
    prepass bit for bit across a zoom/pan sweep — the grid cells' coverage
    circles are conservative supersets of every contained tile circle, and
    supersets cannot change a winner (slot order stays ascending-id in
    both, so quantized-key ties resolve identically)."""
    from raytracingdiffusioncurves_tpu.ops import trace_pallas as tp

    for xml, k, bitwise in (
        ("arch.xml", 16, True),
        # capped scenes sort slots by lower-bound distance FROM THE CELL
        # circle; the per-camera path sorts from the tile circle — a
        # different (equally valid) slot order, so quantized-key ties at
        # curve junctions can flip winners: the tolerated junction-tie
        # class (same as JAX-vs-Pallas), not a culling error.
        ("DiffusionCurvePack/lady_bug.xml", 2, False),
    ):
        scene = rtdc.load_scene(str(ref_xml_dir / xml))
        scene = scene.with_size(48, 48)
        dev = rtdc.build_device_scene(scene, flatten_subdivisions=k)
        cfg = rtdc.RenderConfig(
            rays_per_pixel=16, use_blur=False, use_denoiser=False
        )
        cams = [
            rtdc.Camera(1.0, 0.0, 0.0),
            rtdc.Camera(0.8, 30.0, -20.0),
            rtdc.Camera(1.2, -15.0, 40.0),
        ]
        grid = tp.build_cand_grid(
            dev, cfg, -120.0, -120.0, 120.0, 120.0, zoom_max=1.25
        )
        assert grid is not None, xml
        for cam in cams:
            assert tp.grid_covers(grid, dev, cam, cfg), (xml, cam)
            tabs = tp.grid_tables(grid, dev, cam, cfg)
            a, bm_a = rtdc.trace_image(dev, cam, cfg, backend="pallas")
            b, bm_b = rtdc.trace_image(
                dev, cam, cfg, backend="pallas", cand_tables=tabs,
                gather_len=grid.gather_len,
            )
            if bitwise:
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b), err_msg=f"{xml} {cam}"
                )
            else:
                assert_parity(
                    (np.asarray(a), np.asarray(bm_a)),
                    (np.asarray(b), np.asarray(bm_b)),
                    frac=2e-3,
                )
        # out-of-range cameras are detected (callers rebuild)
        assert not tp.grid_covers(grid, dev, rtdc.Camera(2.0, 0.0, 0.0), cfg)
        assert not tp.grid_covers(grid, dev, rtdc.Camera(1.0, 500.0, 0.0), cfg)


@pytest.mark.slow
def test_gather_gsc_and_remap_builds_bitwise(ref_xml_dir):
    """The gather chunk width (gsc 128 -> 512, batch34) and the three
    remap id-table builds (slices16 / fold / tslice8) are pure layout
    choices: every combination must render bit-identically.  lady_bug at
    flatten_subdivisions=2 gives s_pad > 512 (multi-gchunk gathers at
    every width) with multi-level capped lists (remap active)."""
    from raytracingdiffusioncurves_tpu.ops import trace_pallas as tp

    scene = rtdc.load_scene(
        str(ref_xml_dir / "DiffusionCurvePack" / "lady_bug.xml")
    ).with_size(32, 32)
    dev = rtdc.build_device_scene(scene, flatten_subdivisions=2)
    assert dev.s_pad > 512  # several 512-wide gather chunks
    cfg = rtdc.RenderConfig(rays_per_pixel=8, use_blur=False, use_denoiser=False)
    base, _ = rtdc.trace_image(dev, rtdc.Camera(), cfg, backend="pallas")
    saved = (
        tp._GATHER_GSC, tp._GATHER_WIDE_MIN, tp._REMAP_BUILD,
        tp._GATHER_HIT_SPAN,
    )
    try:
        tp._GATHER_WIDE_MIN = 0  # let the cap apply on this mid-size scene
        for gsc in (128, 256):
            for build in ("slices16", "fold", "tslice8"):
                tp._GATHER_GSC, tp._REMAP_BUILD = gsc, build
                img, _ = rtdc.trace_image(
                    dev, rtdc.Camera(), cfg, backend="pallas"
                )
                np.testing.assert_array_equal(
                    np.asarray(base), np.asarray(img),
                    err_msg=f"gsc={gsc} build={build}",
                )
        # hit-lane-only gather spans are a pure span-walk narrowing: the
        # full-span walk (round-2/3 behavior) must render bit-identically
        tp._GATHER_GSC, tp._REMAP_BUILD = saved[0], saved[2]
        tp._GATHER_WIDE_MIN = saved[1]
        tp._GATHER_HIT_SPAN = False
        img, _ = rtdc.trace_image(dev, rtdc.Camera(), cfg, backend="pallas")
        np.testing.assert_array_equal(
            np.asarray(base), np.asarray(img), err_msg="hit_span=False"
        )
        # outmask: low-bit one-hot built once, chunk select applied to the
        # MXU output — same single-nonzero-term argument, bit-identical
        tp._GATHER_HIT_SPAN = saved[3]
        tp._GATHER_OUTMASK = True
        try:
            img, _ = rtdc.trace_image(
                dev, rtdc.Camera(), cfg, backend="pallas"
            )
            np.testing.assert_array_equal(
                np.asarray(base), np.asarray(img), err_msg="outmask=True"
            )
        finally:
            tp._GATHER_OUTMASK = False
    finally:
        (
            tp._GATHER_GSC, tp._GATHER_WIDE_MIN, tp._REMAP_BUILD,
            tp._GATHER_HIT_SPAN,
        ) = saved


def test_gather_gsc_scene_selection():
    """The per-scene gather chunk width (batch34): whole table in one
    chunk when it fits under the cap; 128 for mid-size multi-chunk
    tables (lady_bug-class); the wide cap only past _GATHER_WIDE_MIN
    (dolphin-class deep tables)."""
    from raytracingdiffusioncurves_tpu.ops import trace_pallas as tp

    assert tp._gather_gsc_for(128) == 128          # headline: single chunk
    assert tp._gather_gsc_for(256) == 256          # still a single chunk
    assert tp._gather_gsc_for(512) == 512          # single chunk at the cap
    assert tp._gather_gsc_for(1152) == 128         # lady_bug-class: narrow
    assert tp._gather_gsc_for(4096) == 128         # gate boundary inclusive
    assert tp._gather_gsc_for(8576) == tp._GATHER_GSC  # dolphin-class: wide


@pytest.mark.slow
def test_parity_capped_candidate_lists_overflow():
    """Dense-scene path: s_pad > 128 forces CAPPED distance-sorted candidate
    lists (cand_len = 128 slots); half-plane wedges (rpp=8 -> 2 wedges) make
    most cells see far more than 128 segments, so the kernel must walk the
    truncated list and continue into the HORIZON-gated seeded chunk walk.
    Parity against the brute-force JAX path proves the fallback is exact."""
    from raytracingdiffusioncurves_tpu.ops import candidates as cm
    from raytracingdiffusioncurves_tpu.ops import trace_pallas as tp

    cfg = rtdc.RenderConfig(rays_per_pixel=8, use_blur=False, use_denoiser=False)

    # (a) chaotic scene (40 random-walk curves, junctions everywhere): the
    # capped-list path must be BIT-IDENTICAL to the full sweep — the accel
    # structure may not change a single winner.  (JAX-vs-Pallas parity is
    # not asserted here: random crossing curves make quantized-key junction
    # ties common, a tolerated cross-path difference class.)
    rng = np.random.RandomState(7)
    curves = []
    for i in range(90):  # > _CAND_LEVELS x 128 sub-segments: the chunk-walk
        x0, y0 = rng.uniform(5, 58, 2)  # fallback must really fire
        pts = [(x0, y0)]
        for _ in range(3):
            x0, y0 = x0 + rng.uniform(-8, 8), y0 + rng.uniform(-8, 8)
            pts.append((round(x0, 2), round(y0, 2)))
        col = f"{rng.randint(256)},{rng.randint(256)},{rng.randint(256)}"
        curves.append(simple_curve(pts, left=[(0, col), (10, col)]))
    scene = rtdc.load_scene_from_string(make_scene_xml(curves))
    dev = rtdc.build_device_scene(scene, flatten_subdivisions=8)
    assert dev.s_pad > tp._cand_len_for(dev.s_pad)  # capped + chunk fallback
    tables = tp.build_cand_tables(dev, rtdc.Camera(), cfg)
    # seg lists (+ slot-geom table when the design applies) + chunk lists
    n_seg = 4 if tp._SLOTGEOM else 3
    assert tables is not None and len(tables) == n_seg + 3
    cand_len = tables[0].shape[-1]  # _CAND_LEVELS x 128 level slots
    assert cand_len == tp._cand_len_for(dev.s_pad) and cand_len < dev.s_pad
    counts = np.asarray(tables[1])
    assert counts.max() > cand_len, "test premise: some cell must overflow"
    lbs = np.asarray(tables[2])
    assert lbs.shape[-1] == cand_len // 8 + 1  # per-GROUP lbs + horizon
    assert (lbs[..., -1] < 1e30).any()  # some real horizons recorded

    img_p, _ = rtdc.trace_image(dev, rtdc.Camera(), cfg, backend="pallas")
    tp._DISABLE_CAND = True
    try:
        img_f, _ = rtdc.trace_image(dev, rtdc.Camera(), cfg, backend="pallas")
    finally:
        tp._DISABLE_CAND = False
    np.testing.assert_array_equal(np.asarray(img_p), np.asarray(img_f))
    # hoisted tables == inline prepass, bit for bit
    img_h, _ = rtdc.trace_image(
        dev, rtdc.Camera(), cfg, backend="pallas", cand_tables=tables
    )
    np.testing.assert_array_equal(np.asarray(img_p), np.asarray(img_h))

    # (b) non-crossing strands (junction ties confined to same-color
    # adjacent segments): JAX-vs-Pallas parity through the capped path.
    strands = [
        simple_curve(
            [(4 + 1.4 * i, 2), (4 + 1.4 * i, 22), (4 + 1.4 * i, 42),
             (4 + 1.4 * i, 62)],
            left=[(0, f"{(i * 37) % 256},{(i * 91) % 256},200"),
                  (30, f"{(i * 37) % 256},{(i * 91) % 256},200")],
            right=[(0, f"200,{(i * 53) % 256},{(i * 17) % 256}"),
                   (30, f"200,{(i * 53) % 256},{(i * 17) % 256}")],
        )
        for i in range(40)
    ]
    scene2 = rtdc.load_scene_from_string(make_scene_xml(strands))
    dev2 = rtdc.build_device_scene(scene2, flatten_subdivisions=8)
    assert dev2.s_pad > 128
    t2 = tp.build_cand_tables(dev2, rtdc.Camera(), cfg)
    # capped multi-level lists; chunk lists ride only when the levels do
    # NOT hold every candidate (auto level count — see _cand_len_for)
    n_seg2 = 4 if tp._SLOTGEOM else 3
    assert len(t2) == (
        n_seg2 if t2[0].shape[-1] >= dev2.s_pad else n_seg2 + 3
    )
    img_j2, bm_j2 = rtdc.trace_image(dev2, rtdc.Camera(), cfg, backend="jax")
    img_p2, bm_p2 = rtdc.trace_image(dev2, rtdc.Camera(), cfg, backend="pallas")
    # near-vertical rays run almost parallel to the strands, so a couple of
    # grazing-tie pixels may flip winners between the paths (frac covers
    # ~2 pixels of 64^2; the structural assertion is the bitwise (a) part)
    assert_parity(
        (np.asarray(img_j2), np.asarray(bm_j2)),
        (np.asarray(img_p2), np.asarray(bm_p2)),
        frac=5e-4,
    )


@pytest.mark.slow
def test_remap_precomp_bitwise():
    """_REMAP_PRECOMP probe lever (host-precomputed hi/lo remap tables —
    measured slower than the in-kernel slices16 build, kept probe-only):
    the precomputed table feeds the EXACT same dot the in-kernel build
    feeds, so output must be BIT-IDENTICAL to the default path."""
    from raytracingdiffusioncurves_tpu.ops import trace_pallas as tp

    cfg = rtdc.RenderConfig(rays_per_pixel=8, use_blur=False, use_denoiser=False)
    rng = np.random.RandomState(7)
    curves = []
    for i in range(40):
        x0, y0 = rng.uniform(5, 58, 2)
        pts = [(x0, y0)]
        for _ in range(3):
            x0, y0 = x0 + rng.uniform(-8, 8), y0 + rng.uniform(-8, 8)
            pts.append((round(x0, 2), round(y0, 2)))
        col = f"{rng.randint(256)},{rng.randint(256)},{rng.randint(256)}"
        curves.append(simple_curve(pts, left=[(0, col), (10, col)]))
    scene = rtdc.load_scene_from_string(make_scene_xml(curves))
    dev = rtdc.build_device_scene(scene, flatten_subdivisions=8)
    assert dev.s_pad > 128  # capped, non-slot lists (the lever's only user)
    img_1, bm_1 = rtdc.trace_image(dev, rtdc.Camera(), cfg, backend="pallas")
    # _REMAP_PRECOMP is a module global invisible to the jit cache key
    tp._REMAP_PRECOMP = True
    tp.trace_sums_flat.clear_cache()
    try:
        img_p, bm_p = rtdc.trace_image(dev, rtdc.Camera(), cfg, backend="pallas")
    finally:
        tp._REMAP_PRECOMP = False
        tp.trace_sums_flat.clear_cache()
    np.testing.assert_array_equal(np.asarray(img_1), np.asarray(img_p))
    np.testing.assert_array_equal(np.asarray(bm_1), np.asarray(bm_p))


@pytest.mark.slow
@pytest.mark.parametrize("split", [2, 4])
def test_walk_split_bitwise(split):
    """_WALK_SPLIT lane-quartered dense walk: each static lane sub-range
    walks the distance-sorted list with its OWN early exit.  The exit is
    conservative per sub-range exactly as per block, so output must be
    BIT-IDENTICAL to the whole-block walk (split=1 default)."""
    from raytracingdiffusioncurves_tpu.ops import trace_pallas as tp

    cfg = rtdc.RenderConfig(rays_per_pixel=8, use_blur=False, use_denoiser=False)
    rng = np.random.RandomState(11)
    curves = []
    for i in range(40):
        x0, y0 = rng.uniform(5, 58, 2)
        pts = [(x0, y0)]
        for _ in range(3):
            x0, y0 = x0 + rng.uniform(-8, 8), y0 + rng.uniform(-8, 8)
            pts.append((round(x0, 2), round(y0, 2)))
        col = f"{rng.randint(256)},{rng.randint(256)},{rng.randint(256)}"
        curves.append(simple_curve(pts, left=[(0, col), (10, col)]))
    scene = rtdc.load_scene_from_string(make_scene_xml(curves))
    dev = rtdc.build_device_scene(scene, flatten_subdivisions=8)
    assert dev.s_pad > 128  # capped, non-slot lists (the split's only user)
    img_1, bm_1 = rtdc.trace_image(dev, rtdc.Camera(), cfg, backend="pallas")
    # _WALK_SPLIT is a module global invisible to the jit cache key
    tp._WALK_SPLIT = split
    tp.trace_sums_flat.clear_cache()
    try:
        img_s, bm_s = rtdc.trace_image(dev, rtdc.Camera(), cfg, backend="pallas")
    finally:
        tp._WALK_SPLIT = 1
        tp.trace_sums_flat.clear_cache()
    np.testing.assert_array_equal(np.asarray(img_1), np.asarray(img_s))
    np.testing.assert_array_equal(np.asarray(bm_1), np.asarray(bm_s))


@pytest.mark.slow
@pytest.mark.parametrize("split", [2, 4])
def test_cwalk_split_bitwise(split):
    """_CWALK_SPLIT lane-split CHUNK walk (the deep-overflow fallback):
    each static lane sub-range walks the sorted chunk list with its OWN
    early exit.  Per-sub-range exits are conservative exactly as the
    whole-block exit is, so output must be BIT-IDENTICAL to the unsplit
    walk — the split may not change a single winner."""
    from raytracingdiffusioncurves_tpu.ops import trace_pallas as tp

    cfg = rtdc.RenderConfig(rays_per_pixel=8, use_blur=False, use_denoiser=False)
    rng = np.random.RandomState(7)
    curves = []
    for i in range(90):  # > levels x 128 sub-segments: the chunk walk fires
        x0, y0 = rng.uniform(5, 58, 2)
        pts = [(x0, y0)]
        for _ in range(3):
            x0, y0 = x0 + rng.uniform(-8, 8), y0 + rng.uniform(-8, 8)
            pts.append((round(x0, 2), round(y0, 2)))
        col = f"{rng.randint(256)},{rng.randint(256)},{rng.randint(256)}"
        curves.append(simple_curve(pts, left=[(0, col), (10, col)]))
    scene = rtdc.load_scene_from_string(make_scene_xml(curves))
    dev = rtdc.build_device_scene(scene, flatten_subdivisions=8)
    assert dev.s_pad > tp._cand_len_for(dev.s_pad)  # chunk fallback reachable
    tables = tp.build_cand_tables(dev, rtdc.Camera(), cfg)
    assert (np.asarray(tables[1]) > tables[0].shape[-1]).any()  # really fires
    img_1, bm_1 = rtdc.trace_image(dev, rtdc.Camera(), cfg, backend="pallas")
    tp._CWALK_SPLIT = split
    tp.trace_sums_flat.clear_cache()
    try:
        img_s, bm_s = rtdc.trace_image(dev, rtdc.Camera(), cfg, backend="pallas")
    finally:
        tp._CWALK_SPLIT = 1
        tp.trace_sums_flat.clear_cache()
    np.testing.assert_array_equal(np.asarray(img_1), np.asarray(img_s))
    np.testing.assert_array_equal(np.asarray(bm_1), np.asarray(bm_s))


@pytest.mark.slow
def test_phase1_cond_bitwise():
    """_PHASE1_COND moves the whole phase-1 block (geometry gather + strict
    test + root isolation) under the per-wedge graze cond.  All-clean wedges
    produce zero iso outputs that the final selects never read, and graze
    wedges compute exactly the hoisted path's values — output must be
    BIT-IDENTICAL to the hoisted phase-1 (default)."""
    from raytracingdiffusioncurves_tpu.ops import trace_pallas as tp

    cfg = rtdc.RenderConfig(rays_per_pixel=8, use_blur=False, use_denoiser=False)
    rng = np.random.RandomState(7)
    curves = []
    for i in range(90):
        x0, y0 = rng.uniform(5, 58, 2)
        pts = [(x0, y0)]
        for _ in range(3):
            x0, y0 = x0 + rng.uniform(-8, 8), y0 + rng.uniform(-8, 8)
            pts.append((round(x0, 2), round(y0, 2)))
        col = f"{rng.randint(256)},{rng.randint(256)},{rng.randint(256)}"
        curves.append(simple_curve(pts, left=[(0, col), (10, col)]))
    scene = rtdc.load_scene_from_string(make_scene_xml(curves))
    dev = rtdc.build_device_scene(scene, flatten_subdivisions=8)
    assert dev.s_pad > 128  # non-slot: the two-phase path really runs
    img_1, bm_1 = rtdc.trace_image(dev, rtdc.Camera(), cfg, backend="pallas")
    tp._PHASE1_COND = True
    tp.trace_sums_flat.clear_cache()
    try:
        img_c, bm_c = rtdc.trace_image(dev, rtdc.Camera(), cfg, backend="pallas")
    finally:
        tp._PHASE1_COND = False
        tp.trace_sums_flat.clear_cache()
    np.testing.assert_array_equal(np.asarray(img_1), np.asarray(img_c))
    np.testing.assert_array_equal(np.asarray(bm_1), np.asarray(bm_c))


@pytest.mark.slow
@pytest.mark.parametrize("pair", [1, 4])
def test_cwalk_pair_bitwise(pair):
    """_CWALK_PAIR chunk-walk body (N chunks swept per exit check): the
    clamped repeat of the final chunk is an idempotent min and parked
    entries are guaranteed misses, so output must be BIT-IDENTICAL across
    pairings (baseline = the shipped default) — over-walking may not
    change a single winner."""
    from raytracingdiffusioncurves_tpu.ops import trace_pallas as tp

    cfg = rtdc.RenderConfig(rays_per_pixel=8, use_blur=False, use_denoiser=False)
    rng = np.random.RandomState(7)
    curves = []
    for i in range(90):  # > levels x 128 sub-segments: the chunk walk fires
        x0, y0 = rng.uniform(5, 58, 2)
        pts = [(x0, y0)]
        for _ in range(3):
            x0, y0 = x0 + rng.uniform(-8, 8), y0 + rng.uniform(-8, 8)
            pts.append((round(x0, 2), round(y0, 2)))
        col = f"{rng.randint(256)},{rng.randint(256)},{rng.randint(256)}"
        curves.append(simple_curve(pts, left=[(0, col), (10, col)]))
    scene = rtdc.load_scene_from_string(make_scene_xml(curves))
    dev = rtdc.build_device_scene(scene, flatten_subdivisions=8)
    assert dev.s_pad > tp._cand_len_for(dev.s_pad)  # chunk fallback reachable
    tables = tp.build_cand_tables(dev, rtdc.Camera(), cfg)
    assert (np.asarray(tables[1]) > tables[0].shape[-1]).any()  # really fires
    img_1, bm_1 = rtdc.trace_image(dev, rtdc.Camera(), cfg, backend="pallas")
    saved = tp._CWALK_PAIR
    tp._CWALK_PAIR = pair
    tp.trace_sums_flat.clear_cache()
    try:
        img_s, bm_s = rtdc.trace_image(dev, rtdc.Camera(), cfg, backend="pallas")
    finally:
        tp._CWALK_PAIR = saved
        tp.trace_sums_flat.clear_cache()
    np.testing.assert_array_equal(np.asarray(img_1), np.asarray(img_s))
    np.testing.assert_array_equal(np.asarray(bm_1), np.asarray(bm_s))


@pytest.mark.slow
@pytest.mark.parametrize("pair", [1, 8])
def test_lwalk_pair_bitwise(pair):
    """_LWALK_PAIR list-walk body (N slot groups swept per exit check):
    parked slots are guaranteed misses and clamped repeats of the last
    group are idempotent minima, so any pairing must be BIT-IDENTICAL to
    the shipped default — over-walking may not change a single winner."""
    from raytracingdiffusioncurves_tpu.ops import trace_pallas as tp

    cfg = rtdc.RenderConfig(rays_per_pixel=8, use_blur=False, use_denoiser=False)
    rng = np.random.RandomState(11)
    curves = []
    for i in range(60):  # > 128 sub-segments: capped level walks fire
        x0, y0 = rng.uniform(5, 58, 2)
        pts = [(x0, y0)]
        for _ in range(3):
            x0, y0 = x0 + rng.uniform(-8, 8), y0 + rng.uniform(-8, 8)
            pts.append((round(x0, 2), round(y0, 2)))
        col = f"{rng.randint(256)},{rng.randint(256)},{rng.randint(256)}"
        curves.append(simple_curve(pts, left=[(0, col), (10, col)]))
    scene = rtdc.load_scene_from_string(make_scene_xml(curves))
    dev = rtdc.build_device_scene(scene, flatten_subdivisions=8)
    assert dev.s_pad > 128  # capped, non-slot lists: the list walk runs
    img_1, bm_1 = rtdc.trace_image(dev, rtdc.Camera(), cfg, backend="pallas")
    saved = tp._LWALK_PAIR
    tp._LWALK_PAIR = pair
    tp.trace_sums_flat.clear_cache()
    try:
        img_s, bm_s = rtdc.trace_image(dev, rtdc.Camera(), cfg, backend="pallas")
    finally:
        tp._LWALK_PAIR = saved
        tp.trace_sums_flat.clear_cache()
    np.testing.assert_array_equal(np.asarray(img_1), np.asarray(img_s))
    np.testing.assert_array_equal(np.asarray(bm_1), np.asarray(bm_s))


@pytest.mark.slow
def test_cand_levels_bitwise():
    """Multi-LEVEL capped lists (_CAND_LEVELS > 1): levels past the first
    are walked only behind their own horizon conds, each remapped with its
    own TC_ID row and merged.  Output must be BIT-IDENTICAL to the
    single-level list + chunk-walk fallback (levels = 1): both resolve the
    exact closest hit, level machinery may not change a single winner."""
    from raytracingdiffusioncurves_tpu.ops import trace_pallas as tp

    cfg = rtdc.RenderConfig(rays_per_pixel=8, use_blur=False, use_denoiser=False)
    rng = np.random.RandomState(23)
    curves = []
    for i in range(40):
        x0, y0 = rng.uniform(5, 58, 2)
        pts = [(x0, y0)]
        for _ in range(3):
            x0, y0 = x0 + rng.uniform(-8, 8), y0 + rng.uniform(-8, 8)
            pts.append((round(x0, 2), round(y0, 2)))
        col = f"{rng.randint(256)},{rng.randint(256)},{rng.randint(256)}"
        curves.append(simple_curve(pts, left=[(0, col), (10, col)]))
    scene = rtdc.load_scene_from_string(make_scene_xml(curves))
    dev = rtdc.build_device_scene(scene, flatten_subdivisions=8)
    assert dev.s_pad > 2 * 128  # at least two real levels at default levels
    # premise: some cells spill past level 0, so the level conds really run
    tables = tp.build_cand_tables(dev, rtdc.Camera(), cfg)
    counts = np.asarray(tables[1])
    assert (counts > 128).any()
    img_m, bm_m = rtdc.trace_image(dev, rtdc.Camera(), cfg, backend="pallas")
    saved = tp._CAND_LEVELS
    tp._CAND_LEVELS = 1
    tp.trace_sums_flat.clear_cache()
    tp.build_cand_tables.clear_cache()
    try:
        img_1, bm_1 = rtdc.trace_image(dev, rtdc.Camera(), cfg, backend="pallas")
    finally:
        tp._CAND_LEVELS = saved
        tp.trace_sums_flat.clear_cache()
        tp.build_cand_tables.clear_cache()
    np.testing.assert_array_equal(np.asarray(img_m), np.asarray(img_1))
    np.testing.assert_array_equal(np.asarray(bm_m), np.asarray(bm_1))


@pytest.mark.slow
def test_adaptive_flattening_min_sub():
    """Dense-scene adaptive flattening (min_subdivisions=2): the bounded-
    sagitta rule alone sizes each cubic.  Pins the three claims the dense
    configs rely on (device.py::build_device_scene docstring): fewer
    sub-segments, per-chord deviation bands still bounded by the sagitta
    rule, and renders that match the uniform-floor build up to closest-hit
    tie flips (hit/miss stays exact under exact silhouettes)."""
    from raytracingdiffusioncurves_tpu.scene import device as dv

    pts = [(5, 5), (20, 8), (35, 20), (50, 30), (55, 45), (40, 55), (30, 58),
           (20, 55), (10, 45), (8, 35), (15, 25), (25, 20), (35, 18)]
    xml = make_scene_xml(
        [
            simple_curve(
                pts,
                left=[(0, "255,0,0"), (40, "0,0,255")],
                right=[(0, "0,255,0"), (40, "255,255,0")],
            )
        ]
    )
    scene = rtdc.load_scene_from_string(xml)
    dev16 = rtdc.build_device_scene(scene, flatten_subdivisions=16)
    dev_ad = rtdc.build_device_scene(scene, flatten_subdivisions=16,
                                     min_subdivisions=2)
    assert dev_ad.n_sub < dev16.n_sub  # the point of the small floor

    # Per-sub-segment deviation bands (ALLT_BAND row, computed by
    # _capsule_bands at build time) stay within the sagitta rule: the
    # adaptive build may not widen the exact-silhouette band past
    # max_sagitta (0.25 default) + the tube radius/derivative pad.
    bands = np.asarray(dev_ad.shade_all_t)[dv.ALLT_BAND, : dev_ad.n_sub]
    assert float(bands.max()) <= 0.30

    # Renders agree with the uniform-floor build up to band-width winner
    # ambiguity: per-candidate distances are exact (root isolation), but
    # the pre-refine winner selection orders by chord keys +- the sagitta
    # band, so rays passing within a band of two curve branches can pick
    # either.  This 64-unit test world makes the 0.25 band ~8x larger
    # relative to the scene than production scenes (lady_bug, 512 units:
    # adaptive-vs-uniform 44.9 dB, ABOVE its 39.2 dB MC seed-flip floor —
    # measured 2026-08-18, 256px x 32rpp, jax backend), so thresholds here
    # are calibrated to that exaggerated class: a ~2% pixel fringe with a
    # small mean.
    cfg = rtdc.RenderConfig(rays_per_pixel=16, use_blur=False,
                            use_denoiser=False)
    img16, _ = rtdc.trace_image(dev16, rtdc.Camera(), cfg, backend="jax")
    img_ad, _ = rtdc.trace_image(dev_ad, rtdc.Camera(), cfg, backend="jax")
    d = np.abs(np.asarray(img16) - np.asarray(img_ad))
    assert (d > 2e-3).mean() < 0.04, f"diff frac {(d > 2e-3).mean()}"
    assert (d > 0.25).mean() < 0.01, f"flip frac {(d > 0.25).mean()}"
    assert d.mean() < 6e-3

    # And the Pallas kernel agrees with the JAX oracle on the adaptive
    # tables (the config3 production path).  Wider windows make cross-
    # backend junction ties slightly more common than the uniform-build
    # 3e-5 allowance (a handful of rays).
    img_p, bm_p = rtdc.trace_image(dev_ad, rtdc.Camera(), cfg, backend="pallas")
    img_j, bm_j = rtdc.trace_image(dev_ad, rtdc.Camera(), cfg, backend="jax")
    assert_parity(
        (np.asarray(img_j), np.asarray(bm_j)),
        (np.asarray(img_p), np.asarray(bm_p)),
        frac=3e-4,
    )


def test_parity_wedge_coarsened_tables():
    """Wedge-coarsened candidate tables (round 5: table entries shared by
    2^shift adjacent wedges when fine per-wedge tables exceed the HBM cap
    — the 4K-class config5 fix) render identically to fine tables: the
    coarser angular spans are conservative supersets, so winners are
    unchanged."""
    import raytracingdiffusioncurves_tpu as rtdc
    from raytracingdiffusioncurves_tpu.ops import trace_pallas as tp

    scene = rtdc.load_scene(
        "/root/reference/optixHello/xmls/arch.xml"
    ).with_size(128, 64)
    dev = rtdc.build_device_scene(scene)
    cam = rtdc.Camera()
    cfg = rtdc.RenderConfig(rays_per_pixel=32, use_blur=False,
                            use_denoiser=False)
    st = rtdc.init_frame_state(128, 64)
    fine, _ = rtdc.render_frame(dev, cam, st, cfg, backend="pallas")
    R, pxb, sw, n_w, tile_h, tx, ty, nb = tp._grid_geom(
        dev, cfg, 128, 128 * 64
    )
    fine_bytes = tp._seg_table_bytes(
        nb, n_w, 64, True, tp._cand_len_for(dev.s_pad)
    )
    saved = tp._CAND_TABLE_HBM_CAP
    try:
        tp._CAND_TABLE_HBM_CAP = fine_bytes // 2  # forces shift >= 1
        assert tp._wedge_coarse_shift(dev, n_w, nb, 64, False)[0] >= 1
        coarse, _ = rtdc.render_frame(dev, cam, st, cfg, backend="pallas")
    finally:
        tp._CAND_TABLE_HBM_CAP = saved
    np.testing.assert_array_equal(np.asarray(fine), np.asarray(coarse))
