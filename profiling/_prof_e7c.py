import time
import numpy as np
from bench_vardct import _make_images
from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy
from libjxl_tpu.api.decoder import decode
from libjxl_tpu.metrics.butteraugli import butteraugli_distance_srgb

img = _make_images(1)[0]
for dev in (False, True):
    out = encode_lossy(img, LossyOptions(distance=1.0, effort=7, use_device=dev))
    px = decode(out)[:, :, :3]
    d = butteraugli_distance_srgb(img, px)
    print(f"dev={dev}: size={len(out)} butteraugli={d:.3f}", flush=True)
