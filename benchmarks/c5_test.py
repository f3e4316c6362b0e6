import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import time, jax
import raytracingdiffusioncurves_tpu as rtdc
from raytracingdiffusioncurves_tpu.ops import trace_pallas as tp
from raytracingdiffusioncurves_tpu.utils import compile_cache
compile_cache.enable()
scene = rtdc.load_scene("/root/reference/optixHello/xmls/arch.xml").with_size(3840, 2160)
dev = rtdc.build_device_scene(scene)
cam = rtdc.Camera()
cfg = rtdc.RenderConfig(rays_per_pixel=1024, use_blur=True, use_denoiser=False)
t0 = time.perf_counter()
tb = tp.build_cand_tables(dev, cam, cfg)
print("tables:", [None if t is None else t.shape for t in tb], "prepass_s", round(time.perf_counter()-t0,1), flush=True)
gl = tp.seg_max_count(dev, tb)
if gl is not None:
    tb = tp.narrow_cand_tables(tb, gl)
st = rtdc.init_frame_state(3840, 2160)
img, st = rtdc.render_frame(dev, cam, st, cfg, backend="pallas", cand_tables=tb, gather_len=gl)
float(img[0,0,0])
t0 = time.perf_counter()
for _ in range(3):
    img, st = rtdc.render_frame(dev, cam, st, cfg, backend="pallas", cand_tables=tb, gather_len=gl)
float(img[0,0,0])
print("coarse-wedge 4k ms/frame:", round((time.perf_counter()-t0)*1000/3,1), "gl:", gl, flush=True)
