"""ctypes bindings for the native C++ scene loader (scene/native/loader.cpp).

The shared library is built on demand (``make`` in scene/native) and loaded
lazily; ``available()`` reports whether the native path can be used.  The
native loader and the Python loader implement the same spec — the reference's
scene pipeline (optixHello.cpp:211-515) — and are pinned against each other
in tests/test_native_loader.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from .xml_loader import AttrTable, SceneTables

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "librtdc_loader.so")
_lib = None


class _RtdcAttr(ctypes.Structure):
    _fields_ = [
        ("index", ctypes.POINTER(ctypes.c_int64)),
        ("u", ctypes.POINTER(ctypes.c_float)),
        ("values", ctypes.POINTER(ctypes.c_float)),
        ("n_entries", ctypes.c_int64),
        ("channels", ctypes.c_int32),
    ]


class _RtdcScene(ctypes.Structure):
    _fields_ = [
        ("width", ctypes.c_int32),
        ("height", ctypes.c_int32),
        ("n_segments", ctypes.c_int64),
        ("n_curves", ctypes.c_int64),
        ("vertices", ctypes.POINTER(ctypes.c_float)),
        ("curve_map", ctypes.POINTER(ctypes.c_int32)),
        ("curve_index", ctypes.POINTER(ctypes.c_int32)),
        ("curve_connect", ctypes.POINTER(ctypes.c_int32)),
        ("curve_first_segment", ctypes.POINTER(ctypes.c_int32)),
        ("curve_segment_count", ctypes.POINTER(ctypes.c_int32)),
        ("color_left", _RtdcAttr),
        ("color_right", _RtdcAttr),
        ("blur", _RtdcAttr),
        ("weight", _RtdcAttr),
        ("weight_degree", _RtdcAttr),
        ("error", ctypes.c_char_p),
        ("impl", ctypes.c_void_p),
    ]


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.rtdc_load_scene.restype = ctypes.POINTER(_RtdcScene)
    lib.rtdc_load_scene.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_double,
        ctypes.c_double,
        ctypes.c_int,
    ]
    lib.rtdc_free_scene.argtypes = [ctypes.POINTER(_RtdcScene)]
    _lib = lib
    return lib


def available() -> bool:
    return _load_lib() is not None


def _attr_from_native(a: _RtdcAttr, n_curves: int) -> AttrTable:
    n = int(a.n_entries)
    ch = int(a.channels)
    index = np.ctypeslib.as_array(a.index, shape=(n_curves * 2,)).reshape(n_curves, 2).copy()
    u = np.ctypeslib.as_array(a.u, shape=(n,)).copy() if n else np.zeros(0, np.float32)
    vals = (
        np.ctypeslib.as_array(a.values, shape=(n * ch,)).reshape(n, ch).copy()
        if n
        else np.zeros((0, ch), np.float32)
    )
    return AttrTable(index=index.astype(np.int64), u=u, values=vals)


def load_scene_native(
    path_or_text: str,
    diffusion_curve_save: bool = True,
    endcap_size: float = 8.0,
    default_weight_degree: float = 0.5,
    is_text: bool = False,
    suppress_endcaps: bool = False,
) -> SceneTables:
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable (build failed)")
    text = path_or_text if is_text else open(path_or_text, "r").read()
    ptr = lib.rtdc_load_scene(
        text.encode(), int(diffusion_curve_save), endcap_size,
        default_weight_degree, int(suppress_endcaps),
    )
    try:
        sc = ptr.contents
        if sc.error:
            raise ValueError(f"native loader: {sc.error.decode()}")
        n_seg, n_cur = int(sc.n_segments), int(sc.n_curves)

        def arr(p, n, dt=np.int32):
            return np.ctypeslib.as_array(p, shape=(n,)).astype(dt, copy=True)

        vertices = (
            np.ctypeslib.as_array(sc.vertices, shape=(n_seg * 8,))
            .reshape(n_seg, 4, 2)
            .copy()
        )
        return SceneTables(
            width=int(sc.width),
            height=int(sc.height),
            vertices=vertices,
            curve_map=arr(sc.curve_map, n_seg),
            curve_index=arr(sc.curve_index, n_seg),
            curve_connect=arr(sc.curve_connect, n_cur),
            curve_first_segment=arr(sc.curve_first_segment, n_cur),
            curve_segment_count=arr(sc.curve_segment_count, n_cur),
            color_left=_attr_from_native(sc.color_left, n_cur),
            color_right=_attr_from_native(sc.color_right, n_cur),
            blur=_attr_from_native(sc.blur, n_cur),
            weight=_attr_from_native(sc.weight, n_cur),
            weight_degree=_attr_from_native(sc.weight_degree, n_cur),
            diffusion_curve_save=diffusion_curve_save,
        )
    finally:
        lib.rtdc_free_scene(ptr)
