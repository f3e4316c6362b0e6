"""Timing, metrics, checkpoint/resume, and image quantization utilities."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import raytracingdiffusioncurves_tpu as rtdc
from raytracingdiffusioncurves_tpu.utils import checkpoint, timing
from raytracingdiffusioncurves_tpu.utils.image import psnr, to_uint8

from conftest import make_scene_xml, simple_curve


def test_phase_timer():
    t = timing.PhaseTimer()
    with t.phase("setup"):
        time.sleep(0.01)
    for _ in range(3):
        with t.phase("frame"):
            time.sleep(0.002)
    s = t.summary()
    assert s["frame"]["count"] == 3
    assert s["setup"]["mean_ms"] >= 10
    assert t.mean_ms("frame") >= 2


def test_metrics():
    m = timing.Metrics()
    m.inc("rays", 100)
    m.inc("rays", 28)
    m.set("fps", 30.5)
    assert '"rays": 128' in m.dump()


def test_checkpoint_roundtrip(tmp_path):
    state = rtdc.init_frame_state(16, 16)
    state = state._replace(
        prev_image=jnp.full((16, 16, 4), 0.25), frame=jnp.int32(7)
    )
    cam = rtdc.Camera(0.5, 3.0, -2.0)
    path = checkpoint.save_session(str(tmp_path / "ckpt.npz"), state, cam)
    state2, cam2, params = checkpoint.load_session(path)
    assert int(state2.frame) == 7
    np.testing.assert_allclose(np.asarray(state2.prev_image), 0.25)
    assert cam2 == cam and params is None


def test_checkpoint_resume_reproduces_frames(tmp_path):
    """Resuming at frame N reproduces frame N bit-for-bit (stateless RNG)."""
    xml = make_scene_xml([simple_curve([(10, 14), (30, 25), (40, 40), (50, 52)])])
    scene = rtdc.load_scene_from_string(xml)
    dev = rtdc.build_device_scene(scene, flatten_subdivisions=4)
    cfg = rtdc.RenderConfig(rays_per_pixel=4, use_blur=False, use_denoiser=True)
    cam = rtdc.Camera()

    state = rtdc.init_frame_state(64, 64)
    img1, state = rtdc.render_frame(dev, cam, state, cfg, backend="jax")
    path = checkpoint.save_session(str(tmp_path / "s.npz"), state, cam)
    img2_direct, _ = rtdc.render_frame(dev, cam, state, cfg, backend="jax")
    state_r, cam_r, _ = checkpoint.load_session(path)
    img2_resumed, _ = rtdc.render_frame(dev, cam_r, state_r, cfg, backend="jax")
    np.testing.assert_array_equal(np.asarray(img2_direct), np.asarray(img2_resumed))


def test_checkpoint_with_denoiser_params(tmp_path):
    from raytracingdiffusioncurves_tpu.models import denoiser as dn

    model, tstate, _ = dn.create_train_state(jax.random.key(0), 8, 8)
    state = rtdc.init_frame_state(8, 8)
    path = checkpoint.save_session(str(tmp_path / "d.npz"), state, rtdc.Camera(), tstate.params)
    _, _, params = checkpoint.load_session(path, denoiser_params_template=tstate.params)
    t1 = jax.tree.leaves(tstate.params)
    t2 = jax.tree.leaves(params)
    for a, b in zip(t1, t2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_to_uint8_matches_reference_quantization():
    """min(c*255, 255) truncated toward zero (glfw_events.cpp:76-79)."""
    img = np.array([[[0.0, 0.5, 1.0, 2.0]]], np.float32)
    q = to_uint8(img, flip_vertical=False)
    np.testing.assert_array_equal(q[0, 0], [0, 127, 255, 255])
    nan_img = np.array([[[np.nan, 0.1, 0.999, 1.0]]], np.float32)
    q = to_uint8(nan_img, flip_vertical=False)
    assert q[0, 0, 0] == 0 and q[0, 0, 2] == 254


def test_psnr():
    a = np.zeros((8, 8))
    assert psnr(a, a) == float("inf")
    b = a + 0.1
    assert psnr(a, b) == pytest.approx(20.0, abs=0.1)
