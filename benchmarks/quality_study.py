"""Quality north-star study (VERDICT r2 #4): decompose the PSNR gap vs the
reference screencaps into measurable components and fill the missing rows.

The BASELINE target is "within 1 dB PSNR of the OptiX reference", but a
cross-renderer PSNR against a JPEG screencap of unknown camera/settings has
a much lower attainable ceiling than 1-dB-equivalence implies.  This study
pins that ceiling per component:

  * MC floor      — PSNR between two of OUR renders at the same settings,
                    different seeds: the best any renderer could score
                    against a third noise realization.
  * JPEG floor    — PSNR of our render through a JPEG round trip at the
                    quality the screencaps appear to use.
  * registration  — identity-camera vs sub-pixel-registered camera rows
                    (the screencaps came from an interactive session,
                    glfw_events.cpp:53-100; a half-pixel pan costs dB).
  * low-pass rows — PSNR after a sigma=3 Gaussian on both sides: if the
                    gap survives smoothing it is a systematic color/shape
                    difference, not noise.

Missing rows added: no_cap.png (line.xml rendered with caps suppressed —
the loader's ``suppress_endcaps``, the reference's USE_ENDCAP=false; line
is the scene whose curve carries use_endcap="true") and gradient128AA.png
(an offset arch.xml view, previously mis-registered against line.xml).

Usage: python benchmarks/quality_study.py [part ...]   (parts: lb, caps,
blurex; default all).  Writes benchmarks/quality_study.json.
"""

from __future__ import annotations

import io
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import raytracingdiffusioncurves_tpu as rtdc  # noqa: E402
from raytracingdiffusioncurves_tpu.models import renderer  # noqa: E402
from raytracingdiffusioncurves_tpu.utils.image import psnr, to_uint8  # noqa: E402

XMLS = "/root/reference/optixHello/xmls"
CAPS = "/root/reference/optixHello/screencaps"
OUT_JSON = os.path.join(os.path.dirname(__file__), "quality_study.json")


def backend():
    return "pallas" if jax.default_backend() == "tpu" else "jax"


def ref_img(cap, size=None):
    from PIL import Image

    im = Image.open(os.path.join(CAPS, cap)).convert("RGB")
    if size is not None and im.size != (size, size):
        im = im.resize((size, size))
    return np.asarray(im, np.float64) / 255.0


def trained_params():
    """The shipped CNN weights (weights/denoiser*.msgpack, newest first), or
    None to fall back to the analytic temporal pass."""
    from raytracingdiffusioncurves_tpu.models import denoiser as dn

    root = os.path.join(os.path.dirname(__file__), "..", "weights")
    cands = sorted(
        (p for p in (os.path.join(root, n) for n in
                     ("denoiser_r3.msgpack", "denoiser.msgpack"))
         if os.path.exists(p)),
        key=lambda p: -os.path.getmtime(p),
    )
    return dn.load_params(cands[0]) if cands else None


def our_render(scene_path, cam, size=512, rpp=128, blur=True, denoise=False,
               seed=0, suppress_endcaps=False, frames=2):
    scene = rtdc.load_scene(
        os.path.join(XMLS, scene_path), suppress_endcaps=suppress_endcaps
    )
    scene = scene.with_size(size, size)
    dev = rtdc.build_device_scene(scene)
    cfg = rtdc.RenderConfig(
        rays_per_pixel=rpp, use_blur=blur, use_denoiser=denoise, seed=seed
    )
    dnp = trained_params() if denoise else None
    state = rtdc.init_frame_state(size, size)
    img, state = rtdc.render_frame(
        dev, cam, state, cfg, backend=backend(), denoiser_params=dnp
    )
    if denoise:
        for _ in range(frames - 1):  # activate the temporal history
            img, state = rtdc.render_frame(
                dev, cam, state, cfg, backend=backend(), denoiser_params=dnp
            )
    # screenshot quantization + vertical flip (glfw_events.cpp:73-81)
    return to_uint8(np.asarray(img), flip_vertical=True)[..., :3].astype(np.float64) / 255.0


def jpeg_roundtrip(img01, quality=85):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray((img01 * 255.0 + 0.5).astype(np.uint8)).save(
        buf, "JPEG", quality=quality
    )
    buf.seek(0)
    return np.asarray(Image.open(buf), np.float64) / 255.0


def lowpass(img01, sigma=3.0):
    r = int(3 * sigma)
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    out = img01
    for ax in (0, 1):
        out = np.apply_along_axis(
            lambda v: np.convolve(v, k, mode="same"), ax, out
        )
    return out


def register_local(scene_path, cap_img, start, size=256, rpp=16, blur=False,
                   rounds=((0.1, 9), (0.03, 7), (0.01, 7), (0.003, 5)),
                   suppress_endcaps=False):
    """Sub-pixel local camera registration by shrinking grid search around
    ``start`` = (zoom, off_x, off_y); all renders chained on device."""
    scene = rtdc.load_scene(
        os.path.join(XMLS, scene_path), suppress_endcaps=suppress_endcaps
    ).with_size(size, size)
    dev = rtdc.build_device_scene(scene)
    cfg = rtdc.RenderConfig(rays_per_pixel=rpp, use_blur=blur, use_denoiser=False,
                            max_blur_radius=4)
    if cap_img.shape[0] != size:
        from PIL import Image

        cap_img = np.asarray(
            Image.fromarray((cap_img * 255).astype(np.uint8)).resize(
                (size, size)
            ),
            np.float64,
        ) / 255.0
    ref = jnp.asarray(cap_img, jnp.float32)

    def mse(zoom, ox, oy):
        img, _ = renderer.trace_image(
            dev, rtdc.Camera(zoom, ox, oy), cfg, 0, backend=backend()
        )
        rgb = jnp.clip(img[::-1, :, :3], 0.0, 1.0)
        return jnp.mean((rgb - ref) ** 2)

    @jax.jit
    def grid(zs, xs, ys):
        zg, xg, yg = jnp.meshgrid(zs, xs, ys, indexing="ij")
        zf, xf, yf = zg.reshape(-1), xg.reshape(-1), yg.reshape(-1)

        def body(i, best):
            m = mse(zf[i], xf[i], yf[i])
            return jax.lax.cond(
                m < best[0], lambda: (m, zf[i], xf[i], yf[i]), lambda: best
            )

        init = (jnp.float32(1e30), zf[0], xf[0], yf[0])
        return jax.lax.fori_loop(0, zf.shape[0], body, init)

    z, x, y = (float(v) for v in start)
    span = size * z  # world span at the start zoom
    m = None
    for shrink, n in rounds:
        zs = jnp.asarray(z * np.exp(np.linspace(-shrink, shrink, n)), jnp.float32)
        xs = jnp.asarray(x + span * np.linspace(-shrink, shrink, n), jnp.float32)
        ys = jnp.asarray(y + span * np.linspace(-shrink, shrink, n), jnp.float32)
        m, z, x, y = (float(v) for v in grid(zs, xs, ys))
    return {"zoom": z, "off_x": x, "off_y": y, "mse": m}


def register_global(scene_path, cap_img, size=128, rpp=8, pool=8,
                    suppress_endcaps=False, blur=False, top=3,
                    zooms=None, offs=None):
    """Exhaustive coarse camera search: render the scene over a full
    (zoom, off_x, off_y) grid and compare POOLED means against the pooled
    screencap — pooling kills MC noise/JPEG/banding sensitivity, so the
    landscape is smooth enough that the best cells bracket the true camera
    even from no seed at all (the round-2/3 seeded local searches landed in
    wrong minima on cap/no_cap: the endpoint fan sits near the image CENTER
    in both captures).  Returns the ``top`` best (zoom, off_x, off_y, mse)
    at ``size`` scale, for register_local refinement."""
    scene = rtdc.load_scene(
        os.path.join(XMLS, scene_path), suppress_endcaps=suppress_endcaps
    ).with_size(size, size)
    dev = rtdc.build_device_scene(scene)
    cfg = rtdc.RenderConfig(rays_per_pixel=rpp, use_blur=blur,
                            use_denoiser=False, max_blur_radius=4)
    from PIL import Image

    cap = np.asarray(
        Image.fromarray((cap_img * 255).astype(np.uint8)).resize((size, size)),
        np.float64,
    ) / 255.0
    p = size // pool
    ref_pool = jnp.asarray(
        cap.reshape(p, pool, p, pool, 3).mean((1, 3)), jnp.float32
    )

    # zoom at `size` scale: a 512-capture zoom z shows the same view at
    # size*z/512... the grid is defined directly at `size` scale.
    if zooms is None:
        zooms = np.geomspace(0.5, 5.0, 21)  # 512-view zoom 0.125..1.25 at 128
    if offs is None:
        offs = np.linspace(-160.0, 160.0, 17)
    zg, xg, yg = np.meshgrid(zooms, offs, offs, indexing="ij")
    zf = jnp.asarray(zg.reshape(-1), jnp.float32)
    xf = jnp.asarray(xg.reshape(-1), jnp.float32)
    yf = jnp.asarray(yg.reshape(-1), jnp.float32)

    @jax.jit
    def sweep():
        def body(i, acc):
            img, _ = renderer.trace_image(
                dev, rtdc.Camera(zf[i], xf[i], yf[i]), cfg, 0,
                backend=backend(),
            )
            rgb = jnp.clip(img[::-1, :, :3], 0.0, 1.0)
            pp = rgb.reshape(p, pool, p, pool, 3).mean((1, 3))
            m = jnp.mean((pp - ref_pool) ** 2)
            return acc.at[i].set(m)

        return jax.lax.fori_loop(
            0, zf.shape[0], body, jnp.full((zf.shape[0],), 1e30, jnp.float32)
        )

    mses = np.asarray(sweep())
    order = np.argsort(mses)[:top]
    return [
        (float(zf[i]), float(xf[i]), float(yf[i]), float(mses[i]))
        for i in order
    ]


def part_lb(results):
    """lady_bug decomposition vs lb16/lb128 (512x512, startup camera)."""
    cam = rtdc.Camera()
    rows = {}
    # calibration: the reference's own pair
    rows["ceiling_ref_lb16_vs_lb128"] = round(
        psnr(ref_img("lb16.jpg"), ref_img("lb128.jpg")), 2
    )
    for rpp in (16, 128):
        cap = ref_img(f"lb{rpp}.jpg")
        a = our_render("DiffusionCurvePack/lady_bug.xml", cam, rpp=rpp, seed=0)
        b = our_render("DiffusionCurvePack/lady_bug.xml", cam, rpp=rpp, seed=1)
        # Converged temporal history (frames=10): the reference caps came
        # from an interactive session with the OptiX TEMPORAL denoiser —
        # their effective noise is far below one frame's at the nominal rpp
        # (their own lb16-vs-lb128 agree to 44 dB).
        d = our_render("DiffusionCurvePack/lady_bug.xml", cam, rpp=rpp,
                       denoise=True, frames=10)
        rows[f"lb{rpp}_mc_floor_seed0_vs_seed1"] = round(psnr(a, b), 2)
        rows[f"lb{rpp}_jpeg85_floor"] = round(psnr(a, jpeg_roundtrip(a)), 2)
        rows[f"lb{rpp}_vs_cap_raw"] = round(psnr(a, cap), 2)
        rows[f"lb{rpp}_vs_cap_denoised10f"] = round(psnr(d, cap), 2)
        rows[f"lb{rpp}_vs_cap_lowpass3"] = round(
            psnr(lowpass(d), lowpass(cap)), 2
        )
    # Our near-noiseless render vs their denoised 128 cap: removes OUR MC
    # term entirely; the residual is their (denoised) noise + JPEG + any
    # systematic difference.
    hi = our_render("DiffusionCurvePack/lady_bug.xml", cam, rpp=1024,
                    denoise=True, frames=10)
    rows["lb128_vs_cap_rpp1024_denoised10f"] = round(
        psnr(hi, ref_img("lb128.jpg")), 2
    )
    rows["lb128_vs_cap_rpp1024_lowpass3"] = round(
        psnr(lowpass(hi), lowpass(ref_img("lb128.jpg"))), 2
    )
    results["lady_bug"] = rows


def part_caps(results):
    """cap.png/no_cap.png are line.xml with endcaps on/off (line is the
    scene whose curve carries use_endcap="true"); both were captured from
    an interactive session at unknown zoom/pan, so each is registered from
    geometric seeds (the visible curve ENDPOINT: the black notch at the
    left edge of no_cap, the radial fan at center of cap).
    gradient128AA is an offset arch.xml view (seed fitted offline from the
    dome-edge + base-fan correspondence against gradient512.png)."""
    rows = {}

    def register_line(capname, suppressed):
        # Global pooled-MSE grid first (round-3 fix: the round-2 geometric
        # seeds put the endpoint fan at an image EDGE; both captures have
        # it near the CENTER, and the seeded local search stayed in the
        # wrong basin), then sub-pixel local refinement from the top seeds.
        cap_img = ref_img(capname)
        seeds = register_global("line.xml", cap_img,
                                suppress_endcaps=suppressed)
        best = None
        for z128, x, y, _ in seeds:
            reg = register_local(
                "line.xml", cap_img, (z128 / 2.0, x, y), size=256,
                rpp=16, rounds=((0.2, 9), (0.05, 7), (0.015, 5), (0.005, 5)),
                suppress_endcaps=suppressed,
            )
            if best is None or reg["mse"] < best["mse"]:
                best = reg
        return best

    reg_nc = register_line("no_cap.png", True)
    reg_c = register_line("cap.png", False)
    for name, reg, sup in (("no_cap", reg_nc, True), ("cap", reg_c, False)):
        z512 = reg["zoom"] * 256 / 512
        cam = rtdc.Camera(z512, reg["off_x"], reg["off_y"])
        ours = our_render("line.xml", cam, rpp=128, blur=False,
                          suppress_endcaps=sup)
        ref = ref_img(f"{name}.png")
        rows[f"{name}_registered"] = round(psnr(ours, ref), 2)
        rows[f"{name}_registered_lowpass3"] = round(
            psnr(lowpass(ours), lowpass(ref)), 2
        )
        rows[f"{name}_registered_cam"] = {
            "zoom_512": round(z512, 6), "off_x": round(reg["off_x"], 3),
            "off_y": round(reg["off_y"], 3), "mse": round(reg["mse"], 6),
        }
        # feature check: the suppression state must matter — the same
        # camera with the OPPOSITE cap state should score worse.
        other = our_render("line.xml", cam, rpp=128, blur=False,
                           suppress_endcaps=not sup)
        rows[f"{name}_wrong_capstate_control"] = round(psnr(other, ref), 2)

    # gradient128AA: arch.xml at an offset camera — global grid + local
    # refinement, same recipe as the cap rows.
    g = ref_img("gradient128AA.png")
    best = None
    for z128, x, y, _ in register_global("arch.xml", g):
        reg = register_local("arch.xml", g, (z128 / 2.0, x, y), size=256,
                             rpp=16, rounds=((0.12, 7), (0.04, 7), (0.012, 5),
                                             (0.004, 5)))
        if best is None or reg["mse"] < best["mse"]:
            best = reg
    zoom512 = best["zoom"] * 256 / 512
    ours_g = our_render("arch.xml", rtdc.Camera(zoom512, best["off_x"],
                                                best["off_y"]), rpp=128,
                        blur=False)
    rows["gradient128AA_vs_registered_arch"] = round(psnr(ours_g, g), 2)
    rows["gradient128AA_registered_cam"] = {
        "zoom_512": round(zoom512, 6),
        "off_x": round(best["off_x"], 3), "off_y": round(best["off_y"], 3),
        "mse": round(best["mse"], 6),
    }
    rows["gradient128AA_mc_floor"] = round(
        psnr(ours_g, our_render("arch.xml",
                                rtdc.Camera(zoom512, best["off_x"], best["off_y"]),
                                rpp=128, blur=False, seed=1)), 2
    )

    # gradient128Denoise.jpg: the same view through the reference's OptiX
    # temporal denoiser (optixHello.cpp:1199-1213) — compare our denoised
    # render (trained CNN if weights are shipped, else the analytic temporal
    # pass) at the camera registered above.
    gd_path = os.path.join(CAPS, "gradient128Denoise.jpg")
    if os.path.exists(gd_path):
        gd = ref_img("gradient128Denoise.jpg")
        cam_g = rtdc.Camera(zoom512, best["off_x"], best["off_y"])
        ours_gd = our_render("arch.xml", cam_g, rpp=128, blur=False,
                             denoise=True, frames=10)
        rows["gradient128Denoise_vs_denoised_render"] = round(
            psnr(ours_gd, gd), 2
        )
        rows["gradient128Denoise_lowpass3"] = round(
            psnr(lowpass(ours_gd), lowpass(gd)), 2
        )
        rows["gradient128Denoise_jpeg_floor"] = round(
            psnr(ours_gd, jpeg_roundtrip(ours_gd)), 2
        )
    results["caps"] = rows


def part_blurex(results):
    """blur-ex/no_blur_ex: multi-start registration at 256 (VERDICT weak #8:
    the round-2 single-start 128px registration landed at ~15 dB)."""
    rows = {}
    cap = ref_img("blur-ex.jpg")
    # Global pooled-MSE grid (wider offset range: the capture is a detail
    # view whose center can sit anywhere in the +-256 world), then local
    # sub-pixel refinement from the top seeds.
    seeds = register_global("DiffusionCurvePack/lady_bug.xml", cap, blur=True,
                            offs=np.linspace(-220.0, 220.0, 23))
    best = None
    for z128, x, y, _ in seeds:
        reg = register_local("DiffusionCurvePack/lady_bug.xml", cap,
                             (z128 / 2.0, x, y), size=256, rpp=16, blur=True,
                             rounds=((0.12, 7), (0.04, 7), (0.012, 5),
                                     (0.004, 5)))
        if best is None or reg["mse"] < best["mse"]:
            best = reg
    zoom512 = best["zoom"] * 256 / 512
    cam = rtdc.Camera(zoom512, best["off_x"], best["off_y"])
    ours_b = our_render("DiffusionCurvePack/lady_bug.xml", cam, rpp=128,
                        blur=True, denoise=True)
    ours_nb = our_render("DiffusionCurvePack/lady_bug.xml", cam, rpp=128,
                         blur=False, denoise=True)
    rows["blur_ex_registered"] = round(psnr(ours_b, cap), 2)
    rows["no_blur_ex_registered"] = round(
        psnr(ours_nb, ref_img("no_blur_ex.jpg")), 2
    )
    rows["registered_cam"] = {
        "zoom_512": round(zoom512, 6), "off_x": round(best["off_x"], 3),
        "off_y": round(best["off_y"], 3), "mse": round(best["mse"], 6),
    }
    results["blurex"] = rows


def main():
    parts = sys.argv[1:] or ["lb", "caps", "blurex"]
    results = {}
    if os.path.exists(OUT_JSON):
        results = json.load(open(OUT_JSON))
    for p in parts:
        {"lb": part_lb, "caps": part_caps, "blurex": part_blurex}[p](results)
        print(json.dumps({p: results.get({"lb": "lady_bug", "caps": "caps",
                                          "blurex": "blurex"}[p])}, indent=1),
              flush=True)
    with open(OUT_JSON, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(f"wrote {OUT_JSON}")


if __name__ == "__main__":
    main()
