import time
import numpy as np
from bench_vardct import _make_images
from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy
from libjxl_tpu.api.decoder import decode
from libjxl_tpu.metrics.butteraugli import butteraugli_distance_srgb

img = _make_images(1)[0]
for dev in (False, True):
    opts = LossyOptions(distance=1.0, effort=7, use_device=dev)
    t0=time.time(); out = encode_lossy(img, opts); warm=time.time()-t0
    best = 1e9
    for _ in range(2):
        t0=time.time(); out = encode_lossy(img, opts); best=min(best, time.time()-t0)
    px = decode(out)[:, :, :3]
    d = butteraugli_distance_srgb(img, px)
    print(f"dev={dev}: warm={warm:.1f}s best={best:.2f}s = {0.786432/best:.3f} MP/s size={len(out)} butteraugli={d:.3f}", flush=True)
