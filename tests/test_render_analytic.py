"""Analytic end-to-end render tests (pure-JAX path, CPU).

Strategy from SURVEY.md §4: the reference shipped no tests, so behaviour is
pinned with scenes whose correct output is derivable by hand."""

import jax.numpy as jnp
import numpy as np
import pytest

import raytracingdiffusioncurves_tpu as rtdc
from raytracingdiffusioncurves_tpu.ops import intersect

from conftest import make_scene_xml, simple_curve


def build(xml, k=8):
    scene = rtdc.load_scene_from_string(xml)
    return rtdc.build_device_scene(scene, flatten_subdivisions=k)


def render(dev, rpp=16, **kw):
    cfg = rtdc.RenderConfig(
        rays_per_pixel=rpp, use_blur=False, use_denoiser=False, **kw
    )
    img, bmap = rtdc.trace_image(dev, rtdc.Camera(), cfg, backend="jax")
    return np.asarray(img), np.asarray(bmap)


# A long straight "vertical" stripe in world space. With the diffusion-save
# axis swap, XML y becomes world x: constant XML y = vertical world line.
def vline(x_world, width=64, height=64, left="255,0,0", right="0,0,255", **kw):
    y_attr = x_world + width // 2
    return simple_curve(
        [(-500 + height // 2, y_attr), (-100 + height // 2, y_attr),
         (100 + height // 2, y_attr), (500 + height // 2, y_attr)],
        left=[(0, left), (10, left)],
        right=[(0, right), (10, right)],
        **kw,
    )


def test_side_purity():
    """Pixels strictly on one side of a long straight line receive only that
    side's color: every hitting ray has the same side-test sign
    (isRayRight, DeviceCode.cu:78-83,334-339)."""
    dev = build(make_scene_xml([vline(0)]))
    img, _ = render(dev, rpp=32)
    # XML right color (0,0,255) -> stored (B,G,R)/255 = (1,0,0);
    # XML left (255,0,0) -> (0,0,1).
    # World: line at x=0, travel direction = +y or -y depending on save flip.
    left_px = img[32, 8, :3]
    right_px = img[32, 56, :3]
    # Both sides must be pure (constant per side) and differ.
    assert not np.allclose(left_px, right_px)
    for px in (left_px, right_px):
        assert {tuple(np.round(px, 4))} <= {(1.0, 0.0, 0.0), (0.0, 0.0, 1.0)}
    # All rows far from the line ends agree.
    np.testing.assert_allclose(img[20:44, 8, :3] - left_px, 0.0, atol=1e-5)
    np.testing.assert_allclose(img[20:44, 56, :3] - right_px, 0.0, atol=1e-5)


def test_two_line_weighting_monotonic():
    """Between two facing lines the mix moves monotonically toward the nearer
    line (weight = w * r^-deg, DeviceCode.cu:330)."""
    xml = make_scene_xml(
        [vline(-20, left="255,255,255", right="0,0,0"),
         vline(20, left="255,255,255", right="255,255,255")],
        width=64, height=64,
    )
    # line at -20: right side (facing +x) is black... determine empirically:
    dev = build(xml)
    img, _ = render(dev, rpp=64)
    row = img[32, 16:48, 0]  # B-channel profile between the lines
    diffs = np.diff(row)
    assert np.all(diffs <= 1e-3) or np.all(diffs >= -1e-3)


def test_all_miss_background():
    """A pixel whose fan misses everything gets config.background (the
    reference produces NaN, DeviceCode.cu:176-181 — documented deviation)."""
    # Tiny far-away segment; pixel at the opposite corner with 2 rays.
    xml = make_scene_xml(
        [simple_curve([(60, 60), (60.2, 60), (60.4, 60), (60.6, 60)])],
        width=64, height=64,
    )
    dev = build(xml)
    cfg = rtdc.RenderConfig(
        rays_per_pixel=2, use_blur=False, use_denoiser=False, use_aa=False,
        background=(0.25, 0.5, 0.75),
    )
    img, bmap = rtdc.trace_image(dev, rtdc.Camera(), cfg, backend="jax")
    img = np.asarray(img)
    assert not np.isnan(img).any()
    assert (np.abs(img[..., :3] - [0.25, 0.5, 0.75]).max(axis=-1) < 1e-6).any()


def test_weight_zero_curve_contributes_no_color():
    """A curve with weight multiplier 0 adds no color — but still occludes,
    because the trace is closest-hit (PortalDemo's invisible middle line:
    rays stopping on it contribute zero weight, DeviceCode.cu:330)."""
    with_ghost = make_scene_xml(
        [vline(0), vline(10, left="0,255,0", right="0,255,0",
                         weight=[(0, 0.0), (10, 0.0)])]
    )
    img, _ = render(build(with_ghost), rpp=16)
    # Ghost is pure green in XML -> stored G channel; it must never appear.
    assert img[..., 1].max() < 1e-6


def test_weight_degree_controls_falloff():
    """Higher weight_degree sharpens the distance falloff: the mix at a fixed
    pixel shifts toward the nearer curve."""
    def scene(deg):
        return make_scene_xml(
            [vline(-24, right="0,0,0", left="0,0,0",
                   weight_degree=[(0, deg), (10, deg)]),
             vline(24, right="255,255,255", left="255,255,255",
                   weight_degree=[(0, deg), (10, deg)])]
        )

    # Pixel closer to the white line.
    px = (32, 32 + 12)
    img_lo, _ = render(build(scene(0.5)), rpp=64)
    img_hi, _ = render(build(scene(2.0)), rpp=64)
    assert img_hi[px][0] > img_lo[px][0]


def test_blur_map_renders_curve_blur_values():
    xml = make_scene_xml([vline(0, blur=[(0, 3.0), (10, 3.0)])])
    dev = build(xml)
    _, bmap = render(dev, rpp=32)
    np.testing.assert_allclose(bmap[32, 8], 3.0, atol=1e-4)


@pytest.mark.slow
def test_deterministic_given_seed_and_frame():
    dev = build(make_scene_xml([vline(0)]))
    a, _ = render(dev, rpp=8)
    b, _ = render(dev, rpp=8)
    np.testing.assert_array_equal(a, b)
    # The frame counter is folded into the RNG: the raw trace sums must
    # change between frames (the normalized image of this solid-color scene
    # is frame-invariant up to rounding, so assert on the weight sums).
    from raytracingdiffusioncurves_tpu.models.renderer import trace_sums_flat

    cfg0 = rtdc.RenderConfig(rays_per_pixel=8, use_blur=False, use_denoiser=False)
    n = dev.width * dev.height
    _, w0, _ = trace_sums_flat(dev, rtdc.Camera(), cfg0, 0, 0, n, backend="jax")
    _, w1, _ = trace_sums_flat(dev, rtdc.Camera(), cfg0, 1, 0, n, backend="jax")
    assert not np.array_equal(np.asarray(w0), np.asarray(w1))


def test_camera_zoom_pan_are_traced_args():
    """Zoom/pan must not recompile (BASELINE config #4): the jitted function
    is called with different Camera values and returns different images."""
    dev = build(make_scene_xml([vline(0)]))
    cfg = rtdc.RenderConfig(rays_per_pixel=4, use_blur=False, use_denoiser=False)
    import jax

    traced = jax.jit(
        lambda cam: rtdc.trace_image(dev, cam, cfg, backend="jax")[0]
    )
    img1 = traced(rtdc.Camera(1.0, 0.0, 0.0))
    with jax.checking_leaks():
        img2 = traced(rtdc.Camera(0.5, 10.0, -5.0))
    assert traced._cache_size() == 1
    assert not np.array_equal(np.asarray(img1), np.asarray(img2))


def test_ray_fan_covers_all_directions():
    """make_rays spreads N rays uniformly over 2*pi (DeviceCode.cu:99,167-171)."""
    cfg = rtdc.RenderConfig(rays_per_pixel=16, use_aa=False)
    pid = jnp.zeros(16, jnp.int32)
    sid = jnp.arange(16, dtype=jnp.int32)
    _, dirs = intersect.make_rays(pid, sid, 64, 64, rtdc.Camera(), cfg)
    angles = np.sort(np.arctan2(np.asarray(dirs[:, 1]), np.asarray(dirs[:, 0])))
    gaps = np.diff(angles)
    np.testing.assert_allclose(gaps, 2 * np.pi / 16, atol=1e-4)
    norms = np.linalg.norm(np.asarray(dirs), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


@pytest.mark.slow
def test_all_reference_scenes_render_smoke(ref_xml_dir):
    """Every shipped scene loads, flattens and renders finite pixels
    (SURVEY §4: demo scenes are the feature fixtures)."""
    import glob

    for path in sorted(glob.glob(str(ref_xml_dir / "**" / "*.xml"), recursive=True)):
        scene = rtdc.load_scene(path)
        scene = scene.with_size(24, 24)
        dev = rtdc.build_device_scene(scene, flatten_subdivisions=2)
        cfg = rtdc.RenderConfig(rays_per_pixel=2, use_blur=False, use_denoiser=False)
        img, bmap = rtdc.trace_image(dev, rtdc.Camera(), cfg, backend="jax")
        assert np.isfinite(np.asarray(img)).all(), path
        assert np.isfinite(np.asarray(bmap)).all(), path
