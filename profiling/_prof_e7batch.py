import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from bench_vardct import _make_images
from libjxl_tpu.vardct.frame_enc import LossyOptions, encode_lossy, encode_lossy_many
imgs = _make_images(4)
opts = LossyOptions(distance=1.0, effort=7, use_device=True)
encode_lossy(imgs[0], opts)  # warm
t0=time.time()
for im in imgs: encode_lossy(im, opts)
seq=time.time()-t0
print(f"e7 sequential 4: {seq:.2f}s = {4*0.786432/seq:.3f} MP/s", flush=True)
for wk in (2, 3):
    best=1e9
    for _ in range(2):
        t0=time.time(); encode_lossy_many(imgs, opts, workers=wk); best=min(best,time.time()-t0)
    print(f"e7 many workers={wk}: {best:.2f}s = {4*0.786432/best:.3f} MP/s", flush=True)
