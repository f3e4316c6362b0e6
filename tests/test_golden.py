"""Golden-render regression tests.

Small committed snapshots (tests/golden/*.npy, 48x48, 16 rpp, full pipeline
incl. temporal denoise + blur, 2 frames) pin end-to-end behavior across
refactors.  The PSNR bar (45 dB) tolerates float reassociation across
JAX/compiler versions but fails on any semantic change; regenerate the
snapshots deliberately (see comment below) when behavior changes on purpose.
"""

import os

import numpy as np
import pytest

import raytracingdiffusioncurves_tpu as rtdc
from raytracingdiffusioncurves_tpu.utils.image import psnr

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
SCENES = {
    "line": "line.xml",
    "portal": "PortalDemo.xml",
    "ladybug": "DiffusionCurvePack/lady_bug.xml",
    "weight_demo": "weight_demo.xml",
}

# Regenerate (after an INTENTIONAL behavior change):
#   render each scene at 48x48, 16 rpp, flatten_subdivisions=6, two frames of
#   render_frame(..., backend="jax", max_blur_radius=4), save float32 .npy.


def render(path):
    scene = rtdc.load_scene(path)
    scene = scene.with_size(48, 48)
    dev = rtdc.build_device_scene(scene, flatten_subdivisions=6)
    cfg = rtdc.RenderConfig(rays_per_pixel=16, use_blur=True, use_denoiser=True)
    state = rtdc.init_frame_state(48, 48)
    img, state = rtdc.render_frame(dev, rtdc.Camera(), state, cfg, backend="jax", max_blur_radius=4)
    img, _ = rtdc.render_frame(dev, rtdc.Camera(), state, cfg, backend="jax", max_blur_radius=4)
    return np.asarray(img)


@pytest.mark.parametrize(
    "name",
    # portal is the one interpret-heavy golden (15 s); the full gate runs it
    [pytest.param(n, marks=pytest.mark.slow) if n == "portal" else n
     for n in sorted(SCENES)],
)
def test_golden(name, ref_xml_dir):
    golden = np.load(os.path.join(GOLDEN_DIR, f"{name}_48.npy"))
    img = render(str(ref_xml_dir / SCENES[name]))
    assert psnr(img, golden) > 45.0, f"{name}: PSNR {psnr(img, golden):.1f} dB vs golden"
