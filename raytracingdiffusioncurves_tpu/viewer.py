"""Interactive viewing: session state machine + optional GUI front-end.

``InteractiveSession`` is the headless core — the equivalent of the
reference's GLFW event handlers (glfw_events.cpp:50-143) driving the jitted
renderer: scroll = zoom by 1.5^-ticks with a zoom-flow update for the
temporal denoiser (:105-112), drag = pan scaled by the zoom factor
(:115-130; the reference's pan-flow call passes zero deltas — fixed here,
documented in PARITY.md), F11 = screenshot (:50-100).  Camera values are
traced jit arguments, so no interaction ever recompiles (BASELINE config #4).

``run_viewer`` wraps the session in a matplotlib window when a display is
available; the session itself needs none.
"""

from __future__ import annotations

import time

import jax
import numpy as np

from .config import Camera, RenderConfig
from .models import renderer
from .ops import flow as flow_ops
from .scene.device import DeviceScene
from .utils.image import save_image

ZOOM_STEP = 1.5  # glfw_events.cpp:39


class InteractiveSession:
    """Drives the renderer with zoom/pan/screenshot semantics of the
    reference viewer."""

    def __init__(
        self,
        scene: DeviceScene,
        config: RenderConfig,
        camera: Camera = Camera(),
        backend: str = "auto",
        tables=None,
        progressive: bool = False,
        denoiser_params=None,
    ):
        self.scene = scene
        self.config = config
        self.camera = camera
        self.backend = backend
        # Trained CNN weights; None = the analytic temporal pass (the
        # reference GUI always runs its pretrained model, optixHello.cpp:1057)
        self.denoiser_params = denoiser_params
        self.state = renderer.init_frame_state(scene.width, scene.height)
        self.frame_times: list[float] = []
        # Progressive refinement: accumulate rays_per_pixel fresh rays per
        # frame while the camera rests; camera motion resets via a *traced*
        # flag so interaction never recompiles (BASELINE config #4).
        self.progressive = progressive
        self.prog = (
            renderer.init_progressive_state(scene.width, scene.height)
            if progressive
            else None
        )
        self._moved = True  # first frame has no history
        # Kept for API compatibility: exact silhouettes (config.py
        # exact_silhouettes; band-widened sweep + Newton accept/reject)
        # make hit/miss exact at any flattening, so deep zoom no longer
        # rebuilds device tables or recompiles.
        self.tables = tables
        # Camera-dependent acceleration tables (trace_pallas
        # build_cand_tables): rebuilt only when the camera rests, reused
        # frame to frame — the GAS-build analogue (optixHello.cpp:764-830).
        self._cand_tables = None
        self._cand_camera = None
        self._gather_len = None
        # Camera-INDEPENDENT world grid (trace_pallas.build_cand_grid):
        # serves MOVING cameras — per-frame tables are one cheap gather, so
        # zoom/pan pays no prepass (the reference's BVH does zero per-frame
        # work too).  Rebuilt only when the camera leaves the grid's
        # validity box (grid_covers), like a BVH refit.
        self._grid = None

    def scroll(self, yoffset: float) -> None:
        """Zoom: zoom_factor *= 1.5^-yoffset, with the radial flow update for
        the temporal denoiser (scroll_callback, glfw_events.cpp:105-112)."""
        old = self.camera.zoom_factor
        new = old * ZOOM_STEP ** (-yoffset)
        flow = flow_ops.add_zoom_flow(self.state.flow, old, new)
        self.state = self.state._replace(flow=flow)
        self.camera = Camera(new, self.camera.offset_x, self.camera.offset_y)
        self._moved = True

    def drag(self, dx_pixels: float, dy_pixels: float) -> None:
        """Pan by a mouse delta in pixels: offset -= delta * zoom
        (mouse_cursor_callback, glfw_events.cpp:122-123) plus the translation
        flow the reference intended (:128)."""
        z = self.camera.zoom_factor
        self.camera = Camera(
            z, self.camera.offset_x - dx_pixels * z, self.camera.offset_y - dy_pixels * z
        )
        flow = flow_ops.add_translation_flow(self.state.flow, -dx_pixels, -dy_pixels)
        self.state = self.state._replace(flow=flow)
        self._moved = True

    def _use_pallas(self) -> bool:
        import jax as _jax

        return _jax.default_backend() == "tpu" or self.backend == "pallas"

    def _world_grid(self):
        """The session's world grid, (re)built to cover the current view
        with a pan/zoom margin when the camera leaves the last box."""
        from .ops import trace_pallas

        if self._grid is not None and trace_pallas.grid_covers(
            self._grid, self.scene, self.camera, self.config
        ):
            return self._grid
        z = float(self.camera.zoom_factor) * ZOOM_STEP  # one zoom-out step
        cx, cy = float(self.camera.offset_x), float(self.camera.offset_y)
        hx = 1.5 * 0.5 * self.scene.width * z  # 1.5x viewport: pan margin
        hy = 1.5 * 0.5 * self.scene.height * z
        self._grid = trace_pallas.build_cand_grid(
            self.scene, self.config, cx - hx, cy - hy, cx + hx, cy + hy,
            zoom_max=z,
        )
        return self._grid

    def _accel_tables(self):
        """(tables, gather_len) for this frame's camera.

        Moving camera -> world-grid selection (one cheap gather, no
        prepass); resting camera (2nd+ frame) -> tight per-camera hoisted
        tables, built once and cached."""
        from .ops import trace_pallas

        if not self._use_pallas():
            return None, None
        if self.camera == self._cand_camera:
            if self._cand_tables is None:
                self._cand_tables = trace_pallas.build_cand_tables(
                    self.scene, self.camera, self.config
                )
                self._gather_len = trace_pallas.seg_max_count(
                    self.scene, self._cand_tables
                )
                if self._gather_len is not None:
                    self._cand_tables = trace_pallas.narrow_cand_tables(
                        self._cand_tables, self._gather_len
                    )
            return self._cand_tables, self._gather_len
        # camera changed this frame
        self._cand_camera = self.camera
        self._cand_tables = None
        grid = self._world_grid()
        if grid is None:
            return None, None
        return (
            trace_pallas.grid_tables(grid, self.scene, self.camera, self.config),
            grid.gather_len,
        )

    def render(self, block: bool = True) -> jax.Array:
        """Render one frame; returns the (H, W, 4) image. Frame time is
        recorded with the reference's protocol (optixHello.cpp:1258-1263).

        ``block=False`` skips the device sync and returns the in-flight
        frame (async dispatch): display loops that read the result anyway
        (np.asarray / u8 quantize) get their sync from the read, so the
        render thread never stalls on a tunnel round trip just to time
        itself — frame_times then record dispatch issue only."""
        t0 = time.perf_counter()
        cand_tables, gather_len = self._accel_tables()
        if self.progressive:
            import jax.numpy as jnp

            image, self.state, self.prog = renderer.render_frame_progressive(
                self.scene,
                self.camera,
                self.state,
                self.prog,
                self.config,
                jnp.bool_(self._moved),
                backend=self.backend,
                cand_tables=cand_tables,
                gather_len=gather_len,
                denoiser_params=self.denoiser_params,
            )
            self._moved = False
        else:
            image, self.state = renderer.render_frame(
                self.scene, self.camera, self.state, self.config,
                backend=self.backend, cand_tables=cand_tables,
                gather_len=gather_len,
                denoiser_params=self.denoiser_params,
            )
        if block:
            image.block_until_ready()
        self.frame_times.append(time.perf_counter() - t0)
        self.last_image = image
        return image

    def screenshot(self, path: str | None = None) -> str:
        """F11 equivalent (key_callback, glfw_events.cpp:50-100)."""
        return save_image(
            np.asarray(self.last_image),
            path,
            flip_vertical=self.config.diffusion_curve_save,
        )

    @property
    def mean_frame_time_ms(self) -> float:
        if not self.frame_times:
            return 0.0
        return 1000.0 * sum(self.frame_times) / len(self.frame_times)


def run_viewer(scene: DeviceScene, config: RenderConfig, camera: Camera = Camera(), backend: str = "auto", tables=None, denoiser_params=None):
    """Open a matplotlib window with scroll-zoom / drag-pan / 's' screenshot.

    Falls back to a headless message when no display is available.
    """
    session = InteractiveSession(scene, config, camera, backend, tables=tables,
                                 denoiser_params=denoiser_params)
    try:
        import matplotlib

        if not matplotlib.get_backend().lower().startswith(("qt", "tk", "gtk", "macosx", "wx")):
            matplotlib.use("TkAgg")
        import matplotlib.pyplot as plt
    except Exception as exc:  # headless environment
        print(f"viewer: no interactive display available ({exc}); "
              "use InteractiveSession programmatically instead")
        return session

    fig, ax = plt.subplots(figsize=(8, 8))
    ax.set_axis_off()
    img = session.render()
    arr = np.asarray(img)[..., :3]
    if config.diffusion_curve_save:
        arr = arr[::-1]
    im = ax.imshow(np.clip(arr, 0, 1))
    dragging = {"on": False, "x": 0.0, "y": 0.0}

    def refresh():
        a = np.asarray(session.render())[..., :3]
        if config.diffusion_curve_save:
            a = a[::-1]
        im.set_data(np.clip(a, 0, 1))
        fig.canvas.draw_idle()

    def on_scroll(event):
        session.scroll(1.0 if event.button == "up" else -1.0)
        refresh()

    def on_press(event):
        dragging.update(on=True, x=event.x, y=event.y)

    def on_release(event):
        dragging["on"] = False

    def on_move(event):
        if dragging["on"]:
            session.drag(event.x - dragging["x"], event.y - dragging["y"])
            dragging.update(x=event.x, y=event.y)
            refresh()

    def on_key(event):
        if event.key in ("s", "f11"):
            print("saved", session.screenshot())

    fig.canvas.mpl_connect("scroll_event", on_scroll)
    fig.canvas.mpl_connect("button_press_event", on_press)
    fig.canvas.mpl_connect("button_release_event", on_release)
    fig.canvas.mpl_connect("motion_notify_event", on_move)
    fig.canvas.mpl_connect("key_press_event", on_key)
    plt.show()
    print(f"Average frame time : {session.mean_frame_time_ms:.2f}ms")
    return session
