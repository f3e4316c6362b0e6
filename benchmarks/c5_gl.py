import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import jax
import raytracingdiffusioncurves_tpu as rtdc
from raytracingdiffusioncurves_tpu.ops import trace_pallas as tp
from raytracingdiffusioncurves_tpu.utils import compile_cache
compile_cache.enable()
scene = rtdc.load_scene("/root/reference/optixHello/xmls/arch.xml").with_size(3840, 2160)
dev = rtdc.build_device_scene(scene)
cam = rtdc.Camera()
cfg = rtdc.RenderConfig(rays_per_pixel=1024, use_blur=True, use_denoiser=False)
w, h = 3840, 2160
R, pxb, sw, n_w, tile_h, tx, ty, nb = tp._grid_geom(dev, cfg, w, w*h)
n_tr = tp._n_traces(dev, cfg)
used, g8, _ = tp._gather_rows_for(dev, cfg, n_tr)
sg = False
shift = tp._wedge_coarse_shift(dev, n_w, nb, g8, sg)
print("shift", shift, "W_t", n_w >> shift, flush=True)
# one band only: counts distribution
row_px = pxb * tx
band_px = 16 * row_px
part = tp._build_cand_tables_inner(dev, cam, cfg, 0, band_px, _force_shift=shift)
counts = jax.device_get(part[2])
import numpy as np
print("band counts: max", counts.max(), "p99", np.percentile(counts, 99), "mean", counts.mean(), flush=True)
