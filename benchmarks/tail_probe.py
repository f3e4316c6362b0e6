"""Decompose the headline frame's tail: trace-only vs +normalize vs full
render_frame (blur cond) vs blur-free config, each chained x20 inside one
jit, 3 repetitions — attributes the bench.py-minus-perf_probe gap and
exposes run-to-run variance on the tunneled chip.
"""

import time

import jax
import jax.numpy as jnp

import raytracingdiffusioncurves_tpu as rtdc
from raytracingdiffusioncurves_tpu.models import renderer
from raytracingdiffusioncurves_tpu.ops import trace_pallas

XML = "/root/reference/optixHello/xmls/arch.xml"
SIZE, RPP, N = 1024, 128, 20


def main():
    scene = rtdc.load_scene(XML).with_size(SIZE, SIZE)
    dev = rtdc.build_device_scene(scene)
    cam = rtdc.Camera(1.0, 0.0, 0.0)
    cfg = rtdc.RenderConfig(
        rays_per_pixel=RPP, use_aa=True, use_blur=True, use_denoiser=False
    )
    cfg_noblur = rtdc.RenderConfig(
        rays_per_pixel=RPP, use_aa=True, use_blur=False, use_denoiser=False
    )
    tables = trace_pallas.build_cand_tables(dev, cam, cfg)
    gl = trace_pallas.seg_max_count(dev, tables)
    if gl is not None:
        tables = trace_pallas.narrow_cand_tables(tables, gl)
    print(f"# gather_len={gl}")

    @jax.jit
    def trace_only(n, tabs):
        def body(i, s):
            c, ws, b = renderer.trace_sums_flat(
                dev, cam, cfg, i + 0 * s.astype(jnp.int32), 0, SIZE * SIZE,
                "pallas", cand_tables=tabs, gather_len=gl,
            )
            return jnp.float32(0.0) * c[0, 0] + s * 0 + 1.0

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    @jax.jit
    def trace_norm(n, tabs):
        def body(i, s):
            img, bm = renderer.trace_image(
                dev, cam, cfg, i + 0 * s.astype(jnp.int32), "pallas",
                tabs, gl,
            )
            return jnp.float32(0.0) * img[0, 0, 0] + s * 0 + 1.0

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def full(config):
        @jax.jit
        def run(st, n, tabs):
            def body(i, carry):
                img, st = carry
                return rtdc.render_frame(
                    dev, cam, st, config, backend="pallas",
                    cand_tables=tabs, gather_len=gl,
                )

            img0 = jnp.zeros((SIZE, SIZE, 4), jnp.float32)
            return jax.lax.fori_loop(0, n, body, (img0, st))

        return run

    st = rtdc.init_frame_state(SIZE, SIZE)
    runs = {
        "trace_only": lambda n: float(trace_only(n, tables)),
        "trace+normalize": lambda n: float(trace_norm(n, tables)),
        "full_blur_cond": None,
        "full_noblur": None,
    }
    fb = full(cfg)
    fn = full(cfg_noblur)
    runs["full_blur_cond"] = lambda n: float(fb(st, n, tables)[0][0, 0, 0])
    runs["full_noblur"] = lambda n: float(fn(st, n, tables)[0][0, 0, 0])

    for name, fn_ in runs.items():
        t0 = time.perf_counter()
        fn_(1)
        comp = time.perf_counter() - t0
        vals = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn_(N)
            vals.append((time.perf_counter() - t0) * 1000 / N)
        print(
            f"{name}: " + " ".join(f"{v:.2f}" for v in vals)
            + f" ms/frame (compile {comp:.0f}s)", flush=True,
        )


if __name__ == "__main__":
    main()
