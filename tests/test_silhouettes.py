"""Exact silhouettes (config.exact_silhouettes): hit/miss is decided by the
Newton residual on the exact cubic over a conservatively band-widened chord
sweep, so silhouettes no longer follow the flattening chords — the TPU
equivalent of the reference's implicit curve intersector
(optixHello.cpp:871-879)."""

import numpy as np
import pytest

import raytracingdiffusioncurves_tpu as rtdc

from conftest import make_scene_xml, simple_curve

# A strongly curved segment: big sagitta, so coarse flattening is visibly
# wrong without the band.
CURVY = make_scene_xml(
    [
        simple_curve(
            [(10, 12), (60, 50), (-40, 20), (50, 55)],
            left=[(0, "255,0,0"), (10, "255,0,0")],
            right=[(0, "0,0,255"), (10, "0,0,255")],
        )
    ]
)


def render(k, zoom, exact, rpp=8, backend="jax", off=(0.0, 0.0)):
    scene = rtdc.load_scene_from_string(CURVY)
    dev = rtdc.build_device_scene(scene, flatten_subdivisions=k)
    cfg = rtdc.RenderConfig(
        rays_per_pixel=rpp, use_aa=False, use_blur=False, use_denoiser=False,
        exact_silhouettes=exact,
    )
    img, _ = rtdc.trace_image(
        dev, rtdc.Camera(zoom, off[0], off[1]), cfg, backend=backend
    )
    return np.asarray(img)


def agreement(a, b):
    return float((np.abs(a - b).max(axis=-1) < 0.05).mean())


# A point ON the curve (world coords; the curve passes through ~(3.7, -20.6)
# at tau ~ 0.5 — the high-curvature region) so the deep-zoom view actually
# contains a silhouette.
ON_CURVE = (3.7, -20.6)


def test_deep_zoom_matches_high_k_oracle():
    """At zoom 0.05 (the view spans ~3 world units of an extremely curved
    segment) a K=8 flattening with exact silhouettes must match a K=64
    oracle better than the chord-only mode; the residual is cross-cubic
    winner ties, documented in PARITY.md."""
    oracle = render(64, 0.05, exact=True, off=ON_CURVE)
    coarse_exact = render(8, 0.05, exact=True, off=ON_CURVE)
    coarse_legacy = render(8, 0.05, exact=False, off=ON_CURVE)
    a_exact = agreement(coarse_exact, oracle)
    a_legacy = agreement(coarse_legacy, oracle)
    assert a_exact > 0.985
    assert a_exact > a_legacy


@pytest.mark.slow
def test_exact_mode_pallas_agrees_with_jax_deep_zoom():
    a = render(8, 0.05, exact=True, off=ON_CURVE, backend="jax")
    b = render(8, 0.05, exact=True, off=ON_CURVE, backend="pallas")
    assert agreement(a, b) > 0.999


def test_default_zoom_unaffected_visually():
    """At zoom 1 the band (sub-pixel) must not change the picture beyond
    silhouette-pixel jitter."""
    exact = render(16, 1.0, exact=True)
    legacy = render(16, 1.0, exact=False)
    assert agreement(exact, legacy) > 0.99
