import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from bench_vardct import _make_images
from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy_many
imgs = _make_images(8)
opts = LossyOptions(distance=1.0, effort=3, use_device=True)
encode_lossy_many(imgs[:2], opts, workers=2)   # warm (batch B=2 compile)
encode_lossy_many(imgs, opts, workers=2)       # warm B=8
for wk in (2, 3):
    best = 1e9
    for _ in range(3):
        t0=time.time(); encode_lossy_many(imgs, opts, workers=wk); best=min(best, time.time()-t0)
    print(f"batched workers={wk}: {best:.2f}s = {8*0.786432/best:.2f} MP/s", flush=True)
imgs16 = _make_images(16)
encode_lossy_many(imgs16, opts, workers=3)
best=1e9
for _ in range(2):
    t0=time.time(); encode_lossy_many(imgs16, opts, workers=3); best=min(best, time.time()-t0)
print(f"batched B=16 workers=3: {best:.2f}s = {16*0.786432/best:.2f} MP/s", flush=True)
