"""Test harness: force the CPU backend with 8 virtual devices so multi-chip
sharding tests run anywhere; TPU-targeted Pallas kernels run in interpret
mode on CPU (selected inside ops/trace_pallas.py)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
# Tests always run on CPU with 8 virtual devices.  The environment may have
# initialized a TPU backend at interpreter start (sitecustomize), so setting
# JAX_PLATFORMS here is too late — override via jax.config and re-init.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

if jax.config.jax_platforms != "cpu":
    jax.config.update("jax_platforms", "cpu")
    from jax.extend.backend import clear_backends

    clear_backends()
assert jax.default_backend() == "cpu"

import pathlib  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_XMLS = pathlib.Path("/root/reference/optixHello/xmls")


@pytest.fixture(scope="session")
def ref_xml_dir():
    if not REFERENCE_XMLS.is_dir():
        pytest.skip("reference scene directory not available")
    return REFERENCE_XMLS


@pytest.fixture(autouse=True)
def _np_seed():
    np.random.seed(0)


def make_scene_xml(curves: list[str], width: int = 64, height: int = 64) -> str:
    """Assemble a curve_set document from raw <curve> snippets."""
    return (
        f'<curve_set image_width="{width}" image_height="{height}" '
        f'nb_curves="{len(curves)}">' + "".join(curves) + "</curve_set>"
    )


def simple_curve(
    points: list[tuple[float, float]],
    left: list[tuple[float, str]] | None = None,
    right: list[tuple[float, str]] | None = None,
    blur: list[tuple[float, float]] | None = None,
    weight: list[tuple[float, float]] | None = None,
    weight_degree: list[tuple[float, float]] | None = None,
    use_endcap: bool = False,
    connects: int | None = None,
) -> str:
    """Build one <curve> element. Colors are (globalID, "R,G,B") tuples.

    Note: in diffusion-curve-save convention (the default) the XML x/y axes
    and R/B channels are swapped by the loader; callers supply raw XML values.
    """
    n_segs = (len(points) - 1) // 3
    left = left or [(0, "255,255,255"), (10 * n_segs, "255,255,255")]
    right = right or [(0, "255,255,255"), (10 * n_segs, "255,255,255")]
    blur = blur or [(0, 0.0), (10 * n_segs, 0.0)]
    attrs = f'use_endcap="{"true" if use_endcap else "false"}"'
    if connects is not None:
        attrs += f' connects="{connects}"'
    parts = [f"<curve {attrs}>"]
    parts.append("<control_points_set>")
    for x, y in points:
        parts.append(f'<control_point x="{x}" y="{y}"/>')
    parts.append("</control_points_set>")
    for tag_set, tag, colors in (
        ("left_colors_set", "left_color", left),
        ("right_colors_set", "right_color", right),
    ):
        parts.append(f"<{tag_set}>")
        for gid, rgb in colors:
            r, g, b = rgb.split(",")
            parts.append(f'<{tag} R="{r}" G="{g}" B="{b}" globalID="{gid}"/>')
        parts.append(f"</{tag_set}>")
    parts.append("<blur_points_set>")
    for gid, v in blur:
        parts.append(f'<best_scale value="{v}" globalID="{gid}"/>')
    parts.append("</blur_points_set>")
    if weight is not None:
        parts.append("<weight_set>")
        for gid, v in weight:
            parts.append(f'<weight w="{v}" globalID="{gid}"/>')
        parts.append("</weight_set>")
    if weight_degree is not None:
        parts.append("<weight_degree_set>")
        for gid, v in weight_degree:
            parts.append(f'<weight_degree w="{v}" globalID="{gid}"/>')
        parts.append("</weight_degree_set>")
    parts.append("</curve>")
    return "".join(parts)
