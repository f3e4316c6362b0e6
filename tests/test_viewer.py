"""Interactive session semantics (glfw_events.cpp equivalents), headless."""

import os

import numpy as np
import pytest

import raytracingdiffusioncurves_tpu as rtdc
from raytracingdiffusioncurves_tpu.viewer import ZOOM_STEP, InteractiveSession

from conftest import make_scene_xml, simple_curve


@pytest.fixture(scope="module")
def session():
    xml = make_scene_xml([simple_curve([(10, 14), (30, 25), (40, 40), (50, 52)])])
    scene = rtdc.load_scene_from_string(xml)
    dev = rtdc.build_device_scene(scene, flatten_subdivisions=8)
    cfg = rtdc.RenderConfig(rays_per_pixel=4, use_blur=False, use_denoiser=True)
    return InteractiveSession(dev, cfg, backend="jax")


def test_scroll_zoom_factor(session):
    z0 = session.camera.zoom_factor
    session.scroll(1.0)  # zoom in: *= 1.5^-1 (glfw_events.cpp:110)
    assert session.camera.zoom_factor == pytest.approx(z0 / ZOOM_STEP)
    session.scroll(-1.0)
    assert session.camera.zoom_factor == pytest.approx(z0)


def test_scroll_updates_flow(session):
    session.state = session.state._replace(flow=np.zeros_like(session.state.flow) * 0)
    session.scroll(1.0)
    flow = np.asarray(session.state.flow)
    assert np.abs(flow).max() > 0  # radial flow written
    # center pixel has (near) zero flow
    h, w = flow.shape[:2]
    assert np.abs(flow[h // 2, w // 2]).max() < 1.0


def test_drag_pan(session):
    cam0 = session.camera
    session.drag(10.0, -4.0)
    assert session.camera.offset_x == pytest.approx(
        cam0.offset_x - 10.0 * cam0.zoom_factor
    )
    assert session.camera.offset_y == pytest.approx(
        cam0.offset_y + 4.0 * cam0.zoom_factor
    )


def test_render_and_screenshot(tmp_path, session):
    img = session.render()
    assert img.shape == (64, 64, 4)
    out = session.screenshot(str(tmp_path / "shot.png"))
    assert os.path.exists(out)
    assert session.mean_frame_time_ms > 0


def test_interaction_does_not_recompile(session):
    """Config #4: zoom/pan are traced args — render after interactions hits
    the same jit cache entry."""
    import jax

    session.render()
    from raytracingdiffusioncurves_tpu.models.renderer import render_frame

    misses0 = render_frame._cache_size()
    session.scroll(1.0)
    session.drag(3.0, 3.0)
    session.render()
    assert render_frame._cache_size() == misses0
