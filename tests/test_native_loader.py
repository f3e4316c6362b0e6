"""Native C++ loader vs Python loader: exact table parity on every scene."""

import glob

import numpy as np
import pytest

from raytracingdiffusioncurves_tpu.scene import native_loader, xml_loader

from conftest import make_scene_xml, simple_curve

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native loader did not build"
)


def assert_scene_equal(a, b):
    assert a.width == b.width and a.height == b.height
    np.testing.assert_array_equal(a.curve_map, b.curve_map)
    np.testing.assert_array_equal(a.curve_index, b.curve_index)
    np.testing.assert_array_equal(a.curve_connect, b.curve_connect)
    np.testing.assert_array_equal(a.curve_first_segment, b.curve_first_segment)
    np.testing.assert_array_equal(a.curve_segment_count, b.curve_segment_count)
    np.testing.assert_array_equal(a.vertices, b.vertices)
    for name in ("color_left", "color_right", "blur", "weight", "weight_degree"):
        ta, tb = getattr(a, name), getattr(b, name)
        np.testing.assert_array_equal(ta.index, tb.index, err_msg=name)
        np.testing.assert_array_equal(ta.u, tb.u, err_msg=name)
        np.testing.assert_array_equal(ta.values, tb.values, err_msg=name)


def test_native_matches_python_on_all_reference_scenes(ref_xml_dir):
    for path in sorted(glob.glob(str(ref_xml_dir / "**" / "*.xml"), recursive=True)):
        py = xml_loader.load_scene(path)
        nat = native_loader.load_scene_native(path)
        assert_scene_equal(py, nat)


def test_native_matches_python_synthetic_endcaps_portals():
    xml = make_scene_xml(
        [
            simple_curve(
                [(0, 20), (20, 22), (40, 18), (60, 20), (70, 25), (75, 30), (80, 40)],
                left=[(0, "200,10,50"), (15, "0,255,0"), (20, "10,10,200")],
                blur=[(0, 1.0), (20, 3.0)],
                weight=[(0, 0.5), (20, 2.0)],
                weight_degree=[(0, 0.3), (20, 1.1)],
                use_endcap=True,
            ),
            simple_curve([(5, 5), (6, 6), (7, 7), (8, 8)], connects=0),
        ]
    )
    py = xml_loader.load_scene_from_string(xml)
    nat = native_loader.load_scene_native(xml, is_text=True)
    assert_scene_equal(py, nat)


def test_native_matches_python_no_save_convention():
    xml = make_scene_xml([simple_curve([(1, 2), (3, 4), (5, 6), (7, 8)])])
    py = xml_loader.load_scene_from_string(xml, diffusion_curve_save=False)
    nat = native_loader.load_scene_native(xml, is_text=True, diffusion_curve_save=False)
    assert_scene_equal(py, nat)


def test_native_reports_errors():
    with pytest.raises(ValueError):
        native_loader.load_scene_native(
            '<curve_set image_width="8" image_height="8"><curve></curve></curve_set>',
            is_text=True,
        )
