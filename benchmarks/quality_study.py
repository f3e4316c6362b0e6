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

Camera registration (round-3 rework): the round-2/3 grid searches swept
thousands of renders through ONE jit dispatch; hour-long dispatches through
the single-client TPU tunnel crashed the worker twice (see
results/quality_r3*.log).  Registration is now two-stage and crash-cheap:

  1. ``xcorr_seeds``: render the scene ONCE (a full-world view), then find
     (zoom, offset) seeds on the HOST by FFT normalized cross-correlation
     of the screencap against that render over a zoom ladder — no
     per-camera renders at all.
  2. ``register_local``: sub-pixel shrinking grid search whose renders are
     dispatched in small fixed-size chunks (seconds each), so a worker
     crash loses nothing (registered cameras are cached in
     benchmarks/cameras_r3.json and every part writes its rows on
     completion).

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
CAM_CACHE = os.path.join(os.path.dirname(__file__), "cameras_r3.json")


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

    import glob

    root = os.path.join(os.path.dirname(__file__), "..", "weights")
    # newest shipped checkpoint wins (the hardcoded two-name list silently
    # skipped denoiser_r3d.msgpack — the r3 +2.23 dB UNet — so the round-3
    # gradient128Denoise row was scored with STALE weights)
    cands = sorted(glob.glob(os.path.join(root, "denoiser*.msgpack")),
                   key=lambda p: -os.path.getmtime(p))
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


# ---------------------------------------------------------------------------
# Stage 1: global seeds by cross-correlation against one full-world render.
# ---------------------------------------------------------------------------


def _screen_render(scene_path, cam, size, rpp, blur=False,
                   suppress_endcaps=False):
    """One screen-oriented float render (rows: world-y increasing downward,
    same convention as the screencaps after the save flip)."""
    scene = rtdc.load_scene(
        os.path.join(XMLS, scene_path), suppress_endcaps=suppress_endcaps
    ).with_size(size, size)
    dev = rtdc.build_device_scene(scene)
    cfg = rtdc.RenderConfig(rays_per_pixel=rpp, use_blur=blur,
                            use_denoiser=False, max_blur_radius=4)
    img, _ = renderer.trace_image(dev, cam, cfg, 0, backend=backend())
    return np.clip(np.asarray(img)[::-1, :, :3], 0.0, 1.0).astype(np.float64)


def _ncc_valid(img, tpl):
    """Normalized cross-correlation map (valid mode) of an (H,W,3) image
    against an (h,w,3) template: FFT correlation per channel + integral-image
    window statistics.  Returns an (H-h+1, W-w+1) float map in [-1, 1]."""
    H, W, _ = img.shape
    h, w, _ = tpl.shape
    t0 = tpl - tpl.mean(axis=(0, 1), keepdims=True)
    tn = np.sqrt((t0 ** 2).sum())
    corr = np.zeros((H, W))
    for ch in range(3):
        fi = np.fft.rfft2(img[..., ch], (H, W))
        ft = np.fft.rfft2(t0[::-1, ::-1, ch], (H, W))
        corr += np.fft.irfft2(fi * ft, (H, W))
    # full correlation with template anchored so that valid region is
    # corr[h-1:, w-1:]; window sums via integral images for normalization
    corr = corr[h - 1:H, w - 1:W]
    n = h * w * 3
    s1 = np.zeros((H - h + 1, W - w + 1))
    s2 = np.zeros((H - h + 1, W - w + 1))
    for ch in range(3):
        c = img[..., ch]
        for arr, acc in ((c, s1), (c * c, s2)):
            ii = np.zeros((H + 1, W + 1))
            ii[1:, 1:] = arr.cumsum(0).cumsum(1)
            acc += (ii[h:, w:] - ii[:-h, w:] - ii[h:, :-w] + ii[:-h, :-w])
    var = np.maximum(s2 - s1 * s1 / n, 0.0)
    denom = np.sqrt(var) * tn
    return np.where(denom > 1e-9, corr / np.maximum(denom, 1e-9), -1.0)


def xcorr_seeds(scene_path, cap_img, suppress_endcaps=False,
                zooms_512=None, world_res=1024, world_rpp=32, pool=2, top=4):
    """Global (zoom, off_x, off_y) seeds: ONE full-world render of the
    scene, then host-side FFT NCC of the pooled screencap against it over a
    ladder of candidate zooms.  Replaces the 11k-render jit sweep that
    crashed the TPU worker (results/quality_r3_early.log).

    Returns up to ``top`` (zoom_512, off_x, off_y, ncc) seeds, best first.
    ``zoom_512``: world units per pixel at the 512² capture size."""
    scene = rtdc.load_scene(os.path.join(XMLS, scene_path))
    span = 1.45 * max(scene.width, scene.height)
    zw = span / world_res
    world = _screen_render(scene_path, rtdc.Camera(zw, 0.0, 0.0), world_res,
                           world_rpp, suppress_endcaps=suppress_endcaps)
    # pool the world render (kills MC noise; NCC then runs at zoom zw*pool)
    rp = world_res // pool
    wp = world.reshape(rp, pool, rp, pool, 3).mean((1, 3))
    zwp = zw * pool
    if zooms_512 is None:
        # cap shows between ~1/10 of the scene and slightly more than all
        zooms_512 = np.geomspace(0.05 * span / 512, 1.1 * span / 512, 25)
    from PIL import Image

    cap8 = Image.fromarray((np.asarray(cap_img) * 255).astype(np.uint8))
    peaks = []
    for z in zooms_512:
        t = int(round(512 * z / zwp))  # capture size in pooled-world pixels
        if t < 16 or t > rp:
            continue
        tpl = np.asarray(cap8.resize((t, t), Image.LANCZOS), np.float64) / 255.0
        ncc = _ncc_valid(wp, tpl)
        r0, c0 = np.unravel_index(np.argmax(ncc), ncc.shape)
        # template center in pooled-world pixels -> world offset
        ox = (c0 + t / 2.0 - rp / 2.0) * zwp
        oy = (r0 + t / 2.0 - rp / 2.0) * zwp
        peaks.append((float(z), float(ox), float(oy), float(ncc[r0, c0])))
    peaks.sort(key=lambda s: -s[3])
    out = []
    for p in peaks:  # dedupe near-identical seeds across adjacent zooms
        if all(abs(p[0] - q[0]) / q[0] > 0.12 or
               abs(p[1] - q[1]) + abs(p[2] - q[2]) > 0.1 * 512 * q[0]
               for q in out):
            out.append(p)
        if len(out) >= top:
            break
    return out


# ---------------------------------------------------------------------------
# Stage 2: sub-pixel refinement in small fixed-size dispatch chunks.
# ---------------------------------------------------------------------------


def register_local(scene_path, cap_img, start, size=256, rpp=32, blur=False,
                   rounds=((0.2, 7), (0.06, 7), (0.02, 7), (0.006, 5),
                           (0.002, 5)),
                   suppress_endcaps=False, pool=2, chunk=16,
                   explicit_cams=None):
    """Sub-pixel camera registration: shrinking grid search around
    ``start`` = (zoom, off_x, off_y) at ``size``² resolution.

    Renders are dispatched ``chunk`` cameras at a time (one jit, constant
    shape — compiles once) so no single RPC runs longer than a few seconds
    through the TPU tunnel; the previous whole-grid-in-one-dispatch design
    crashed the worker (results/quality_r3b.log).

    ``pool``: average-pool factor for the MSE.  Diffusion-curve scenes are
    piecewise-smooth, so only edges/fans carry alignment signal and plain
    MSE bottoms out at the MC noise floor before sub-pixel alignment;
    pooling cuts noise variance by pool² while edges keep moving across
    cell boundaries (measured: the round-2 plain-MSE refine left
    gradient128AA ~25 px off)."""
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
    pq = size // pool
    ref = jnp.asarray(cap_img, jnp.float32)
    if pool > 1:
        ref = ref.reshape(pq, pool, pq, pool, 3).mean((1, 3))
    bkd = backend()

    @jax.jit
    def eval_chunk(zb, xb, yb):
        def body(i, acc):
            img, _ = renderer.trace_image(
                dev, rtdc.Camera(zb[i], xb[i], yb[i]), cfg, 0, backend=bkd
            )
            rgb = jnp.clip(img[::-1, :, :3], 0.0, 1.0)
            if pool > 1:
                rgb = rgb.reshape(pq, pool, pq, pool, 3).mean((1, 3))
            return acc.at[i].set(jnp.mean((rgb - ref) ** 2))

        return jax.lax.fori_loop(
            0, zb.shape[0], body, jnp.zeros(zb.shape[0], jnp.float32)
        )

    def eval_cams(cams):
        """MSEs for a host-side list of (z, x, y), chunked dispatches."""
        cams = np.asarray(cams, np.float32)
        out = np.empty(len(cams), np.float64)
        for i in range(0, len(cams), chunk):
            part = cams[i:i + chunk]
            n_real = len(part)
            if n_real < chunk:
                part = np.concatenate(
                    [part, np.repeat(part[-1:], chunk - n_real, 0)]
                )
            m = np.asarray(eval_chunk(jnp.asarray(part[:, 0]),
                                      jnp.asarray(part[:, 1]),
                                      jnp.asarray(part[:, 2])))
            out[i:i + n_real] = m[:n_real]
        return out

    z, x, y = (float(v) for v in start)
    m = None
    if explicit_cams is not None:
        # constrained sweeps (e.g. the anchored endpoint registration of
        # register_caps_anchored.py): evaluate a caller-built camera list
        # first, then shrink around its best
        cams = np.asarray(explicit_cams, np.float64)
        mses = eval_cams(cams)
        best = int(np.argmin(mses))
        m, (z, x, y) = float(mses[best]), (float(cams[best, 0]),
                                           float(cams[best, 1]),
                                           float(cams[best, 2]))
    for shrink, n in rounds:
        span = size * z  # world span at the current zoom
        zs = z * np.exp(np.linspace(-shrink, shrink, n))
        xs = x + span * np.linspace(-shrink, shrink, n)
        ys = y + span * np.linspace(-shrink, shrink, n)
        zg, xg, yg = np.meshgrid(zs, xs, ys, indexing="ij")
        cams = np.stack([zg.reshape(-1), xg.reshape(-1), yg.reshape(-1)], 1)
        mses = eval_cams(cams)
        best = int(np.argmin(mses))
        m, (z, x, y) = float(mses[best]), (float(cams[best, 0]),
                                           float(cams[best, 1]),
                                           float(cams[best, 2]))
    return {"zoom": z, "off_x": x, "off_y": y, "mse": m}


def _cam_cache():
    return json.load(open(CAM_CACHE)) if os.path.exists(CAM_CACHE) else {}


def _cam_cache_put(name, entry):
    cache = _cam_cache()
    cache[name] = entry
    with open(CAM_CACHE, "w") as f:
        json.dump(cache, f, indent=1, sort_keys=True)


def register_cap(capname, scene_path, suppress_endcaps=False, blur=False,
                 refine_size=256, refine_rpp=32, refine_chunk=16,
                 extra_seeds=(), max_seeds=3):
    """Registered camera for a screencap: cameras_r3.json cache, else
    xcorr_seeds + register_local (best seed by refined pooled MSE).
    Returns {"zoom_512", "off_x", "off_y", "mse"} (zoom at 512² scale)."""
    cached = _cam_cache().get(capname)
    if cached is not None:
        return cached
    cap_img = ref_img(capname)
    seeds = xcorr_seeds(scene_path, cap_img,
                        suppress_endcaps=suppress_endcaps)[:max_seeds]
    seeds = [(z, x, y) for z, x, y, _ in seeds] + [tuple(s) for s in extra_seeds]
    best = None
    for z512, x, y in seeds:
        zref = z512 * 512 / refine_size
        reg = register_local(scene_path, cap_img, (zref, x, y),
                             size=refine_size, rpp=refine_rpp, blur=blur,
                             suppress_endcaps=suppress_endcaps,
                             chunk=refine_chunk)
        if best is None or reg["mse"] < best["mse"]:
            best = reg
    entry = {
        "zoom_512": round(best["zoom"] * refine_size / 512, 6),
        "off_x": round(best["off_x"], 3),
        "off_y": round(best["off_y"], 3),
        "mse": round(best["mse"], 6),
    }
    _cam_cache_put(capname, entry)
    return entry


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
    an interactive session at unknown zoom/pan.  gradient128AA/Denoise are
    arch.xml at an offset detail camera.  All cameras come from
    register_cap (xcorr seeds + chunked refinement)."""
    rows = {}

    # cap first; its camera seeds no_cap too — the pair was captured by
    # toggling USE_ENDCAP at the SAME view (the fan sits at the same spot
    # in both screencaps), and no_cap alone is nearly featureless without
    # the cap, so its solo search can settle on a fanless gradient.
    reg_c = register_cap("cap.png", "line.xml", suppress_endcaps=False)
    reg_nc = register_cap(
        "no_cap.png", "line.xml", suppress_endcaps=True,
        extra_seeds=[(reg_c["zoom_512"], reg_c["off_x"], reg_c["off_y"])],
    )
    for name, reg, sup in (("no_cap", reg_nc, True), ("cap", reg_c, False)):
        cam = rtdc.Camera(reg["zoom_512"], reg["off_x"], reg["off_y"])
        ours = our_render("line.xml", cam, rpp=128, blur=False,
                          suppress_endcaps=sup)
        ref = ref_img(f"{name}.png")
        rows[f"{name}_registered"] = round(psnr(ours, ref), 2)
        rows[f"{name}_registered_lowpass3"] = round(
            psnr(lowpass(ours), lowpass(ref)), 2
        )
        # Regional decomposition: the residual is NOT uniform — the flat
        # color region (lower-right quadrant, past the curve) matches to
        # ~46 dB, while the left half carries the captures' deterministic
        # sampling banding (fixed per-pixel direction sets, an artifact our
        # stratified AA sampler cannot reproduce sample-for-sample; the
        # no-AA reproduction attempt scored LOWER — sample offsets differ).
        rows[f"{name}_flat_quadrant"] = round(
            psnr(ours[280:, 280:], ref[280:, 280:]), 2
        )
        rows[f"{name}_left_half"] = round(
            psnr(ours[:, :256], ref[:, :256]), 2
        )
        rows[f"{name}_registered_cam"] = reg
        rows[f"{name}_mc_floor"] = round(
            psnr(ours, our_render("line.xml", cam, rpp=128, blur=False,
                                  suppress_endcaps=sup, seed=1)), 2
        )
        # feature check: the suppression state must matter — the same
        # camera with the OPPOSITE cap state should score worse.
        other = our_render("line.xml", cam, rpp=128, blur=False,
                           suppress_endcaps=not sup)
        rows[f"{name}_wrong_capstate_control"] = round(psnr(other, ref), 2)

    # gradient128AA: arch.xml at an offset camera.
    g = ref_img("gradient128AA.png")
    reg_g = register_cap("gradient128AA.png", "arch.xml")
    cam_g = rtdc.Camera(reg_g["zoom_512"], reg_g["off_x"], reg_g["off_y"])
    ours_g = our_render("arch.xml", cam_g, rpp=128, blur=False)
    rows["gradient128AA_vs_registered_arch"] = round(psnr(ours_g, g), 2)
    rows["gradient128AA_registered_cam"] = reg_g
    rows["gradient128AA_lowpass3"] = round(
        psnr(lowpass(ours_g), lowpass(g)), 2
    )
    rows["gradient128AA_mc_floor"] = round(
        psnr(ours_g, our_render("arch.xml", cam_g, rpp=128, blur=False,
                                seed=1)), 2
    )

    # gradient128Denoise.jpg: the same view through the reference's OptiX
    # temporal denoiser (optixHello.cpp:1199-1213) — compare our denoised
    # render (trained CNN if weights are shipped, else the analytic temporal
    # pass) at the camera registered above.
    gd_path = os.path.join(CAPS, "gradient128Denoise.jpg")
    if os.path.exists(gd_path):
        gd = ref_img("gradient128Denoise.jpg")
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
    """blur-ex/no_blur_ex: registration at 256 (VERDICT weak #8: the
    round-2 single-start 128px registration landed at ~15 dB).  blur-ex is
    a heavily blurred detail view; NCC seeds come from the UNBLURRED world
    render (pooling ≈ blur at seed scale), the refinement renders blur."""
    rows = {}
    cap = ref_img("blur-ex.jpg")
    reg = register_cap("blur-ex.jpg", "DiffusionCurvePack/lady_bug.xml",
                       blur=True, refine_rpp=16, refine_chunk=8)
    cam = rtdc.Camera(reg["zoom_512"], reg["off_x"], reg["off_y"])
    ours_b = our_render("DiffusionCurvePack/lady_bug.xml", cam, rpp=128,
                        blur=True, denoise=True)
    ours_nb = our_render("DiffusionCurvePack/lady_bug.xml", cam, rpp=128,
                         blur=False, denoise=True)
    rows["blur_ex_registered"] = round(psnr(ours_b, cap), 2)
    rows["blur_ex_lowpass3"] = round(
        psnr(lowpass(ours_b), lowpass(cap)), 2
    )
    rows["no_blur_ex_registered"] = round(
        psnr(ours_nb, ref_img("no_blur_ex.jpg")), 2
    )
    rows["registered_cam"] = reg
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
        with open(OUT_JSON, "w") as f:  # checkpoint after every part
            json.dump(results, f, indent=1, sort_keys=True)
    print(f"wrote {OUT_JSON}")


if __name__ == "__main__":
    main()
