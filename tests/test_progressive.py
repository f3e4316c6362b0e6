"""Progressive refinement (BASELINE config #4): accumulate fresh stratified
rays across frames while the camera rests, reset (traced, recompile-free) on
motion.  The accumulator holds the same raw sums __raygen__rg accumulates
in-pixel (DeviceCode.cu:153-160), summed over frames."""

import jax.numpy as jnp
import numpy as np
import pytest

import raytracingdiffusioncurves_tpu as rtdc
from raytracingdiffusioncurves_tpu.models import renderer
from raytracingdiffusioncurves_tpu.viewer import InteractiveSession

from conftest import make_scene_xml, simple_curve


@pytest.fixture(scope="module")
def dev():
    xml = make_scene_xml([simple_curve([(10, 14), (30, 25), (40, 40), (50, 52)])])
    scene = rtdc.load_scene_from_string(xml)
    return rtdc.build_device_scene(scene, flatten_subdivisions=8)


CFG = rtdc.RenderConfig(rays_per_pixel=4, use_aa=True, use_blur=False, use_denoiser=False)


def test_accumulation_is_exact_sum_of_passes(dev):
    """Two accumulated passes == normalizing the sum of each frame's raw
    trace sums, bit for bit."""
    cam = rtdc.Camera()
    state = rtdc.init_frame_state(dev.width, dev.height)
    prog = rtdc.init_progressive_state(dev.width, dev.height)

    img1, state1, prog1 = rtdc.render_frame_progressive(
        dev, cam, state, prog, CFG, jnp.bool_(True), backend="jax"
    )
    img2, state2, prog2 = rtdc.render_frame_progressive(
        dev, cam, state1, prog1, CFG, jnp.bool_(False), backend="jax"
    )
    assert int(prog2.passes) == 2

    h, w = dev.height, dev.width
    sums = [
        renderer.trace_sums_flat(dev, cam, CFG, f, 0, h * w, backend="jax")
        for f in (0, 1)
    ]
    csum = (sums[0][0] + sums[1][0]).reshape(h, w, 3)
    wsum = (sums[0][1] + sums[1][1]).reshape(h, w)
    bsum = (sums[0][2] + sums[1][2]).reshape(h, w)
    expected, _ = renderer.normalize_sums(csum, wsum, bsum, CFG)
    np.testing.assert_array_equal(np.asarray(img2), np.asarray(expected))


def test_reset_drops_history(dev):
    """A reset pass equals a fresh 1-pass render at that frame counter."""
    cam = rtdc.Camera()
    state = rtdc.init_frame_state(dev.width, dev.height)
    prog = rtdc.init_progressive_state(dev.width, dev.height)
    _, state, prog = rtdc.render_frame_progressive(
        dev, cam, state, prog, CFG, jnp.bool_(True), backend="jax"
    )
    cam2 = rtdc.Camera(0.8, 3.0, -2.0)
    img, _, prog2 = rtdc.render_frame_progressive(
        dev, cam2, state, prog, CFG, jnp.bool_(True), backend="jax"
    )
    assert int(prog2.passes) == 1

    fresh_state = rtdc.init_frame_state(dev.width, dev.height)._replace(
        frame=state.frame
    )
    fresh, _ = rtdc.render_frame(dev, cam2, fresh_state, CFG, backend="jax")
    np.testing.assert_array_equal(np.asarray(img), np.asarray(fresh))


def test_passes_converge_toward_high_rpp(dev):
    """8 accumulated 4-rpp passes lands closer to a 64-rpp render than one."""
    cam = rtdc.Camera()
    gt_cfg = rtdc.RenderConfig(
        rays_per_pixel=64, use_aa=True, use_blur=False, use_denoiser=False
    )
    gt, _ = rtdc.render_frame(
        dev, cam, rtdc.init_frame_state(dev.width, dev.height), gt_cfg, backend="jax"
    )
    state = rtdc.init_frame_state(dev.width, dev.height)
    prog = rtdc.init_progressive_state(dev.width, dev.height)
    imgs = []
    for i in range(8):
        img, state, prog = rtdc.render_frame_progressive(
            dev, cam, state, prog, CFG, jnp.bool_(i == 0), backend="jax"
        )
        imgs.append(np.asarray(img))
    err1 = float(np.mean((imgs[0][..., :3] - np.asarray(gt)[..., :3]) ** 2))
    err8 = float(np.mean((imgs[-1][..., :3] - np.asarray(gt)[..., :3]) ** 2))
    assert err8 < err1 * 0.5


def test_progressive_session_no_recompile(dev):
    """Motion resets via a traced flag: zoom/pan/reset never recompile."""
    cfg = rtdc.RenderConfig(
        rays_per_pixel=4, use_aa=True, use_blur=False, use_denoiser=True
    )
    s = InteractiveSession(dev, cfg, backend="jax", progressive=True)
    s.render()
    n0 = renderer.render_frame_progressive._cache_size()
    s.render()  # accumulate
    s.scroll(1.0)  # move -> reset
    s.render()
    s.drag(2.0, 1.0)
    s.render()
    assert renderer.render_frame_progressive._cache_size() == n0
    assert int(s.prog.passes) == 1  # last frame followed a move
