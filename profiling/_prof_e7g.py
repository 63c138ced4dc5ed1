import time
import numpy as np
from bench_vardct import _make_images
from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy

img = _make_images(1)[0]
for dev in (True, False):
    opts = LossyOptions(distance=1.0, effort=7, use_device=dev)
    t0=time.time(); out = encode_lossy(img, opts); print(f"dev={dev} warm={time.time()-t0:.1f}s size={len(out)}", flush=True)
    best = 1e9
    for _ in range(3):
        t0=time.time(); out = encode_lossy(img, opts); best=min(best, time.time()-t0)
        print(f"  run {time.time()-t0:.2f}s", flush=True)
    print(f"dev={dev}: best={best:.2f}s = {0.786432/best:.3f} MP/s", flush=True)
