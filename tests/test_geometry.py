"""Property tests for the curve math (scene/geometry.py)."""

import numpy as np
import pytest

from raytracingdiffusioncurves_tpu.scene import geometry


def random_ctrl(n=8):
    return np.random.uniform(-200, 200, size=(n, 4, 2)).astype(np.float32)


def test_bspline_conversion_reproduces_bezier():
    """The canonical representation change: the uniform cubic B-spline through
    the converted control points (reference optixHello.cpp:76-79,1335-1343 +
    DeviceCode.cu:71-75) is the same curve as the original Bezier."""
    pts = random_ctrl()
    conv = geometry.bspline_from_bezier(pts)
    ts = np.linspace(0, 1, 33)
    for p, c in zip(pts, conv):
        bez = geometry.bezier_point(p, ts)
        bsp = geometry.bspline_point(c, ts)
        np.testing.assert_allclose(bez, bsp, rtol=1e-4, atol=1e-3)


def test_bspline_derivative_matches_bezier_derivative():
    pts = random_ctrl()
    conv = geometry.bspline_from_bezier(pts)
    ts = np.linspace(0, 1, 17)
    for p, c in zip(pts, conv):
        db = geometry.bezier_derivative(p, ts)
        ds = geometry.bspline_derivative(c, ts)
        np.testing.assert_allclose(db, ds, rtol=1e-4, atol=1e-2)


def test_bezier_endpoint_interpolation():
    pts = random_ctrl(1)[0]
    np.testing.assert_allclose(geometry.bezier_point(pts, 0.0), pts[0], atol=1e-5)
    np.testing.assert_allclose(geometry.bezier_point(pts, 1.0), pts[3], atol=1e-5)


def test_right_normal_is_perpendicular_and_right_handed():
    d = np.array([[1.0, 0.0], [0.0, 1.0], [3.0, -4.0]])
    n = geometry.right_normal(d)
    np.testing.assert_allclose(np.sum(n * d, axis=-1), 0.0, atol=1e-6)
    # For travel along +x, "right" is -y... the reference defines the normal
    # as (dy, -dx) (DeviceCode.cu:64-68): +x travel -> (0, -1).
    np.testing.assert_allclose(n[0], [0.0, -1.0])


def test_endcap_points_geometry():
    """Endcap control points sit at distance sqrt(2)*size from the endpoint,
    symmetric about the tangent direction (optixHello.cpp:1360-1369)."""
    endpoint = np.array([10.0, -5.0])
    tangent = np.array([0.0, 2.0])  # +y tangent => cos=1, sin=0
    p1, p2 = geometry.endcap_points(endpoint, tangent, 8.0)
    np.testing.assert_allclose(p1, [10.0 - 8.0, -5.0 + 8.0], atol=1e-4)
    np.testing.assert_allclose(p2, [10.0 + 8.0, -5.0 + 8.0], atol=1e-4)
    for p in (p1, p2):
        assert np.linalg.norm(p - endpoint) == pytest.approx(np.sqrt(2) * 8.0, rel=1e-5)


def test_endcap_segment_is_closed_loop():
    seg = np.array([[0, 0], [10, 0], [20, 0], [30, 0]], np.float32)
    cap = geometry.make_endcap_segment(seg, at_start=True, endcap_size=8.0)
    np.testing.assert_allclose(cap[0], seg[0])
    np.testing.assert_allclose(cap[3], seg[0])
    # Start cap bulges *against* the curve direction (reversed tangent,
    # optixHello.cpp:256-259): curve goes +x, so the cap extends toward -x.
    assert cap[1][0] < 0 and cap[2][0] < 0
    end = geometry.make_endcap_segment(seg, at_start=False, endcap_size=8.0)
    np.testing.assert_allclose(end[0], seg[3])
    assert end[1][0] > 30 and end[2][0] > 30
