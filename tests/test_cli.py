"""CLI end-to-end tests (in-process main(), CPU backend)."""

import os

import numpy as np
import pytest
from PIL import Image

from raytracingdiffusioncurves_tpu.cli import main

from conftest import REFERENCE_XMLS, make_scene_xml, simple_curve


@pytest.fixture()
def scene_file(tmp_path):
    xml = make_scene_xml([simple_curve([(10, 14), (30, 25), (40, 40), (50, 52)])], 48, 48)
    p = tmp_path / "scene.xml"
    p.write_text(f"<!DOCTYPE CurveSetXML>\n{xml}")
    return str(p)


def test_cli_renders_png(tmp_path, scene_file):
    out = str(tmp_path / "out.png")
    rc = main([scene_file, "4", "--no-denoiser", "--backend", "jax", "--out", out])
    assert rc == 0 and os.path.exists(out)
    img = np.asarray(Image.open(out))
    assert img.shape == (48, 48, 4)
    assert img.max() > 0


def test_cli_frames_and_session_roundtrip(tmp_path, scene_file):
    out = str(tmp_path / "o.png")
    ckpt = str(tmp_path / "sess.npz")
    rc = main([scene_file, "2", "--no-denoiser", "--backend", "jax",
               "--frames", "3", "--out", out, "--save-session", ckpt])
    assert rc == 0 and os.path.exists(ckpt)
    rc = main([scene_file, "2", "--no-denoiser", "--backend", "jax",
               "--resume", ckpt, "--out", out])
    assert rc == 0


def test_cli_size_override_and_camera(tmp_path, scene_file):
    out = str(tmp_path / "z.png")
    rc = main([scene_file, "2", "--no-denoiser", "--backend", "jax",
               "--width", "32", "--height", "32", "--zoom", "0.5",
               "--offset-x", "4", "--out", out])
    assert rc == 0
    assert np.asarray(Image.open(out)).shape[:2] == (32, 32)


def test_cli_sharded_devices(tmp_path, scene_file):
    out = str(tmp_path / "s.png")
    rc = main([scene_file, "2", "--no-denoiser", "--backend", "jax",
               "--devices", "4", "--out", out])
    assert rc == 0 and os.path.exists(out)


@pytest.mark.skipif(not REFERENCE_XMLS.is_dir(), reason="no reference scenes")
def test_cli_reference_scene(tmp_path):
    out = str(tmp_path / "line.png")
    rc = main([str(REFERENCE_XMLS / "line.xml"), "8", "--no-denoiser", "--no-blur",
               "--backend", "jax", "--out", out])
    assert rc == 0
    img = np.asarray(Image.open(out), float) / 255.0
    # side purity well inside each half (saved image is vertically flipped:
    # red fills the lower half, cyan-blue the upper)
    assert img[384, 256, 0] > 0.9 and img[384, 256, 2] < 0.1