"""Learned denoiser: training reduces loss; analytic denoiser blend semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import raytracingdiffusioncurves_tpu as rtdc
from raytracingdiffusioncurves_tpu.models import denoiser as dn
from raytracingdiffusioncurves_tpu.ops import denoise as denoise_ops
from raytracingdiffusioncurves_tpu.ops import flow as flow_ops


@pytest.mark.slow  # UNet train-step jit dominates (14 s); full gate runs it
def test_train_step_reduces_loss_on_fixed_batch():
    model, state, tx = dn.create_train_state(jax.random.key(0), 32, 32, lr=3e-3)
    key = jax.random.key(1)
    target = jax.random.uniform(key, (2, 32, 32, 3))
    noisy = target + 0.2 * jax.random.normal(jax.random.key(2), target.shape)
    batch = {
        "noisy": noisy,
        "warped_prev": target,
        "aux": jnp.zeros((2, 32, 32, 2)),
        "target": target,
    }
    first = dn.loss_fn(model, state.params, batch)
    for _ in range(30):
        state, loss = dn.train_step(model, tx, state, batch)
    assert float(loss) < float(first) * 0.7
    assert int(state.step) == 30


def test_apply_denoiser_mix_semantics():
    """blendFactor = 1 - mix (optixHello.cpp:1131): mix=0 returns the input."""
    model, state, _ = dn.create_train_state(jax.random.key(0), 16, 16)
    img = jnp.ones((16, 16, 4)) * 0.5
    prev = jnp.zeros((16, 16, 4))
    bm = jnp.zeros((16, 16))
    out0 = dn.apply_denoiser(model, state.params, img, prev, bm, mix=0.0)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(img), atol=1e-6)


def test_analytic_temporal_denoise_blend():
    img = jnp.full((8, 8, 4), 0.8)
    prev = jnp.zeros_like(img)
    fl = flow_ops.zero_flow(8, 8)
    # mix=0 -> passthrough
    out = denoise_ops.temporal_denoise(img, prev, fl, jnp.int32(1), mix=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)
    # frame 0 with mix=1 -> spatial only (constant image unchanged)
    out = denoise_ops.temporal_denoise(img, prev, fl, jnp.int32(0), mix=1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_temporal_denoise_uses_flow_history():
    """A shifted previous frame is warped back by the flow before blending."""
    h = w = 16
    cur = jnp.zeros((h, w, 4))
    prev = jnp.zeros((h, w, 4)).at[:, 8:, :].set(1.0)
    fl = flow_ops.add_translation_flow(flow_ops.zero_flow(h, w), 4.0, 0.0)
    out = denoise_ops.temporal_denoise(cur, prev, fl, jnp.int32(3), mix=1.0)
    out = np.asarray(out)
    # history shifted left by 4: columns >= 4 inherit prev's step at col 12
    assert out[8, 13, 0] > out[8, 3, 0]


@pytest.mark.slow
def test_training_on_renderer_output_smoke():
    from raytracingdiffusioncurves_tpu.models.train_denoiser import sample_example
    from conftest import make_scene_xml, simple_curve

    xml = make_scene_xml([simple_curve([(10, 14), (30, 25), (40, 40), (50, 52)])], 32, 32)
    scene = rtdc.load_scene_from_string(xml)
    dev = rtdc.build_device_scene(scene, flatten_subdivisions=4)
    rng = np.random.default_rng(0)
    batch = sample_example(dev, rng, 32, "jax", frame=0)
    model, state, tx = dn.create_train_state(jax.random.key(0), 32, 32)
    state, loss = dn.train_step(model, tx, state, batch)
    assert np.isfinite(float(loss))


def test_render_frame_with_learned_denoiser():
    """render_frame accepts trained CNN params in place of the analytic
    temporal denoiser."""
    from conftest import make_scene_xml, simple_curve

    xml = make_scene_xml([simple_curve([(10, 14), (30, 25), (40, 40), (50, 52)])], 32, 32)
    scene = rtdc.load_scene_from_string(xml)
    dev = rtdc.build_device_scene(scene, flatten_subdivisions=4)
    model, state, _ = dn.create_train_state(jax.random.key(0), 32, 32)
    cfg = rtdc.RenderConfig(rays_per_pixel=4, use_blur=False, use_denoiser=True)
    fstate = rtdc.init_frame_state(32, 32)
    img, fstate = rtdc.render_frame(
        dev, rtdc.Camera(), fstate, cfg, backend="jax", denoiser_params=state.params
    )
    assert np.isfinite(np.asarray(img)).all()
    img2, _ = rtdc.render_frame(
        dev, rtdc.Camera(), fstate, cfg, backend="jax", denoiser_params=state.params
    )
    assert np.isfinite(np.asarray(img2)).all()


def test_shipped_weights_load_and_apply():
    """The shipped checkpoint(s) under weights/ must restore structurally
    (load_params is architecture-agnostic), resolve to a matching module
    (net_for_params) and denoise a frame to finite values — pins the
    artifact the CLI auto-loads by default."""
    import glob
    import os

    root = os.path.join(os.path.dirname(__file__), "..", "weights")
    paths = sorted(glob.glob(os.path.join(root, "denoiser*.msgpack")))
    assert paths, "no shipped denoiser weights"
    for p in paths:
        params = dn.load_params(p)
        model = dn.net_for_params(params)
        image = jnp.concatenate(
            [jnp.linspace(0, 1, 23 * 37 * 3).reshape(23, 37, 3),
             jnp.ones((23, 37, 1))], axis=-1)  # odd dims: UNet pad path
        out = dn.apply_denoiser(
            model, params, image, image, jnp.zeros((23, 37)), frame=1
        )
        assert out.shape == (23, 37, 4)
        assert np.isfinite(np.asarray(out)).all(), p


def test_packed_unet_matches_plain_forward():
    """The space-to-depth packed UNet inference path (the config3 tail
    optimization: full-res convs are layout-bound at 24 channels, so the
    same math runs on half-res 4x-channel tensors) reproduces the plain
    module forward to ~1 bf16 ulp — every bf16 product is identical, only
    f32 accumulation order inside each conv changes."""
    key = jax.random.PRNGKey(3)
    h, w = 16, 24
    model = dn.UNetDenoiser(base=8)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    noisy = jax.random.uniform(k1, (1, h, w, 3))
    prev = jax.random.uniform(k2, (1, h, w, 3))
    aux = jax.random.uniform(k3, (1, h, w, 2))
    params = model.init(k4, noisy, prev, aux)
    plain = np.asarray(model.apply(params, noisy, prev, aux))
    packed = np.asarray(dn.apply_unet_packed(params, noisy, prev, aux))
    assert np.abs(plain - packed).max() < 2e-3  # ~1 ulp of bf16 at O(1)
    # and apply_denoiser routes the UNet through it (flag on by default)
    assert dn.PACKED_UNET_INFERENCE


def test_packed_unet_odd_size_via_apply_denoiser():
    """apply_denoiser's reflect-pad-to-4 path composes with the packed
    forward: odd image sizes produce identical results with the packed
    path on and off (same 1-ulp class tolerance)."""
    params = dn.load_params("weights/denoiser_r3d.msgpack")
    model = dn.net_for_params(params)
    if not isinstance(model, dn.UNetDenoiser):
        pytest.skip("shipped weights are not a UNet")
    key = jax.random.PRNGKey(7)
    image = jnp.concatenate(
        [jax.random.uniform(key, (23, 37, 3)), jnp.ones((23, 37, 1))], -1
    )
    bmap = jnp.zeros((23, 37))
    saved = dn.PACKED_UNET_INFERENCE
    try:
        dn.PACKED_UNET_INFERENCE = True
        a = np.asarray(dn.apply_denoiser(model, params, image, image, bmap,
                                         frame=1))
        dn.PACKED_UNET_INFERENCE = False
        b = np.asarray(dn.apply_denoiser(model, params, image, image, bmap,
                                         frame=1))
    finally:
        dn.PACKED_UNET_INFERENCE = saved
    # 5e-3 = ~1 bf16 ulp at O(1): with PALLAS_CONV on, the packed route is
    # the flat chain, whose dec0 presummed phase kernel adds one bf16
    # rounding (see test_packed_unet_pallas_conv_path).
    assert np.abs(a - b).max() < 5e-3


def test_warp_separable_matches_generic():
    """The MXU separable warp must match the generic gather warp on every
    flow this renderer produces (zoom + pan accumulations,
    ops/flow.py add_zoom_flow/add_translation_flow)."""
    import numpy as np

    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(size=(33, 47, 4)), jnp.float32)
    fl = flow_ops.zero_flow(33, 47)
    fl = flow_ops.add_zoom_flow(fl, 1.0, 1.37)
    fl = flow_ops.add_translation_flow(fl, 2.25, -1.5)
    fl = flow_ops.add_zoom_flow(fl, 1.37, 0.8)
    a = np.asarray(flow_ops.warp_by_flow(img, fl))
    b = np.asarray(flow_ops.warp_separable(img, fl))
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_warp_separable_zero_flow_identity():
    """All-zero flow takes the skip branch — and the skipped warp must be
    BITWISE what the un-skipped one produces (identity resampling matrices),
    so the cond is a pure perf lever for static cameras."""
    import numpy as np

    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.uniform(size=(19, 29, 4)), jnp.float32)
    out = np.asarray(flow_ops.warp_separable(img, flow_ops.zero_flow(19, 29)))
    np.testing.assert_array_equal(out, np.asarray(img))
    # cross-check the identity claim against the generic warp (no skip)
    gen = np.asarray(flow_ops.warp_by_flow(img, flow_ops.zero_flow(19, 29)))
    np.testing.assert_array_equal(gen, np.asarray(img))
    # tiny nonzero flow still warps (the cond's other branch)
    fl = flow_ops.add_translation_flow(flow_ops.zero_flow(19, 29), 0.5, 0.0)
    moved = np.asarray(flow_ops.warp_separable(img, fl))
    assert np.abs(moved - np.asarray(img)).max() > 0.0


@pytest.mark.slow  # ~55 s: 9 small renders (3 cams x 3 images, rpp up to 256)
def test_dataset_gen_shard_resume(tmp_path):
    """Dataset gen checkpoints per (scene, cam-chunk) shard, and a resumed
    run (missing final npz and one shard) reproduces the dataset BITWISE —
    the per-chunk RNG re-seed guarantees a resumed run draws the same
    cameras a fresh one would (models/train_denoiser.py generate)."""
    import os

    from raytracingdiffusioncurves_tpu.models import train_denoiser as td
    from conftest import make_scene_xml, simple_curve

    xml_path = tmp_path / "scene.xml"
    xml_path.write_text(
        make_scene_xml([simple_curve([(10, 14), (30, 25), (40, 40), (50, 52)])], 32, 32)
    )
    out = tmp_path / "d.npz"
    # scene index 2 in the dict: shard names/seeds follow the index
    kw = dict(size=32, cams_per_scene=3, seed=5, backend="jax", chunk_cams=2)
    td.generate({2: str(xml_path)}, str(out), **kw)
    ref = dict(np.load(out))
    assert ref["noisy"].shape[0] == 3
    shards = sorted((tmp_path / "d.npz.shards").iterdir())
    assert len(shards) == 2  # cam chunks 0:2 and 2:3
    # resume: final npz gone, second shard gone -> only that chunk re-renders
    os.remove(out)
    os.remove(shards[1])
    td.generate({2: str(xml_path)}, str(out), **kw)
    new = dict(np.load(out))
    for k in ref:
        np.testing.assert_array_equal(ref[k], new[k])


def test_pallas_conv_matches_xla_conv():
    """ops/conv_pallas.py conv3x3_same is bitwise-equal to the XLA bf16
    conv + bias (+ReLU) it replaces (interpret mode; the kernel matches
    XLA's round-then-add-bias order exactly), including lane/alignment
    padding paths (Cin not a 128 multiple, odd sizes)."""
    from raytracingdiffusioncurves_tpu.ops import conv_pallas

    key = jax.random.PRNGKey(3)
    for (h, w, ci, co, relu) in ((23, 37, 11, 24, True),
                                 (16, 20, 44, 96, True),
                                 (9, 50, 24, 12, False)):
        x = jax.random.normal(jax.random.fold_in(key, h), (h, w, ci))
        k = jax.random.normal(jax.random.fold_in(key, w),
                              (3, 3, ci, co)) * 0.1
        b = jax.random.normal(jax.random.fold_in(key, co), (co,))
        y = conv_pallas.conv3x3_same(x, k, b, relu=relu)
        bf = jnp.bfloat16
        ref = jax.lax.conv_general_dilated(
            x.astype(bf)[None], k.astype(bf), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0] + b.astype(bf)
        if relu:
            ref = jnp.maximum(ref, bf(0))
        np.testing.assert_array_equal(
            np.asarray(y, np.float32), np.asarray(ref, np.float32)
        )


def test_packed_unet_pallas_conv_path():
    """The flat-chain Pallas forward (apply_unet_flat — the PALLAS_CONV
    route) stays in the same ~1-ulp class as the plain forward: identical
    math to apply_unet_packed except the shared flat layout and dec0's
    pre-summed phase kernel (exact f32 sum, one bf16 rounding)."""
    params = dn.load_params("weights/denoiser_r3d.msgpack")
    model = dn.net_for_params(params)
    if not isinstance(model, dn.UNetDenoiser):
        pytest.skip("shipped weights are not a UNet")
    key = jax.random.PRNGKey(11)
    noisy = jax.random.uniform(key, (1, 24, 28, 3))
    prev = jax.random.uniform(jax.random.fold_in(key, 1), (1, 24, 28, 3))
    aux = jnp.zeros((1, 24, 28, 2))
    plain = np.asarray(model.apply(params, noisy, prev, aux))
    flat = np.asarray(dn.apply_unet_flat(params, noisy, prev, aux))
    # 5e-3 = ~1 bf16 ulp at output magnitude ~1: the dec0 presummed phase
    # kernel rounds the summed weight once where the packed path rounds
    # each of four products (measured max 3.9e-3 vs apply_unet_packed,
    # mean 5e-4 — pure accumulation-class, not structural).
    assert np.abs(plain - flat).max() < 5e-3
