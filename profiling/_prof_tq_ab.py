import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from bench_vardct import _make_images
from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy
from libjxl_tpu.config import config
img = _make_images(1)[0]
opts = LossyOptions(distance=1.0, effort=7, use_device=True)
for mode in (True, False, True, False):
    config.device_transform = mode
    encode_lossy(img, opts)  # warm this mode
    best=1e9
    for _ in range(3):
        t0=time.time(); encode_lossy(img, opts); best=min(best,time.time()-t0)
    print(f"device_transform={mode}: best {best:.2f}s = {0.786432/best:.3f} MP/s", flush=True)
config.device_transform = True
